"""Multi-host execution: jax.distributed bring-up + distributed-SHT check.

The reference scales across nodes with MPI communicators
(comm_param_mod.f90:288-359); the TPU-native equivalent is
jax.distributed.initialize + a global mesh whose collectives ride ICI
within a slice and DCN across slices (SURVEY.md §5.8). This module carries

  * init_multihost(): thin wrapper over jax.distributed.initialize;
  * a __main__ worker that builds a global mesh over all processes'
    devices, runs the m-sharded SHT synthesis (parallel.sht_shard) and the
    sharded amplitude CG (parallel.cg_shard), and verifies both against
    replicated single-host references — the multi-host CI path that needs
    no TPU pod (multi-process CPU with Gloo collectives).

Usage (one line per process, any host):
  python -m commander_tpu.parallel.multihost <pid> <nproc> <coordinator>
"""
from __future__ import annotations

import sys


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int):
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _worker(pid: int, nproc: int, coordinator: str):
    import os

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    init_multihost(coordinator, nproc, pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..sphere import sht
    from . import cg_shard, sht_shard

    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax)
    nl = lmax + 1
    rng = np.random.default_rng(0)            # same seed on every process
    alm = rng.standard_normal((2, nl, nl)) \
        + 1j * rng.standard_normal((2, nl, nl))
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    alm[:, :, 0] = alm[:, :, 0].real

    mesh = Mesh(np.asarray(jax.devices()), ("sphere",))
    ref = sht.alm2map(plan, jnp.asarray(alm))

    @jax.jit
    def check(alm_in, ref_in):
        fr = sht_shard.sharded_alm2map_rings(plan, alm_in, mesh)
        m = sht_shard.rings_to_map(plan, fr)
        return jnp.max(jnp.abs(m - ref_in))

    with mesh:
        rep = NamedSharding(mesh, P())
        alm_g = jax.device_put(jnp.asarray(alm), rep)
        ref_g = jax.device_put(ref, rep)
        err = float(jax.device_get(check(alm_g, ref_g)))
    assert err < 1e-10, f"sharded SHT mismatch across hosts: {err}"

    # sharded amplitude CG across hosts
    npix = 12 * nside * nside
    from ..sampling import amplitude as amp
    F = jnp.asarray(1.0 + rng.uniform(0.2, 1.0, (2, 1)))
    bl = jnp.ones((2, 1, nl))
    rms = jnp.asarray(rng.uniform(0.5, 2.0, (2, 1, npix)))
    ell = np.arange(nl)
    cl = np.zeros((1, 1, nl))
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = jnp.asarray(rng.normal(0, 1, (2, 1, npix)))
    syst = amp.build_system(F, bl, rms, jnp.asarray(cl), data)
    a_ref, _ = amp.sample_amplitudes(syst, plan, key=None, tol=1e-10,
                                     maxiter=200)
    with mesh:
        syst_g = jax.device_put(syst, NamedSharding(mesh, P()))
        a_sh, res = cg_shard.sample_amplitudes_sharded(
            syst_g, plan, mesh, key=None, tol=1e-10, maxiter=200)
        diff = jax.jit(lambda x, y: jnp.max(jnp.abs(x - y)))(
            a_sh, jax.device_put(a_ref, NamedSharding(mesh, P())))
        cg_err = float(jax.device_get(diff))
    assert cg_err < 1e-8, f"sharded CG mismatch across hosts: {cg_err}"

    # 2-D band x sphere mesh across hosts: band groups span processes, the
    # SHT of every band sharded within its group (P3 x P2)
    err_2d = -1.0
    ndev = len(jax.devices())
    if ndev >= 4 and ndev % 2 == 0:
        mesh2 = Mesh(np.asarray(jax.devices()).reshape(2, ndev // 2),
                     ("band", "sphere"))
        with mesh2:
            syst_g = jax.device_put(syst, NamedSharding(mesh2, P()))
            a_2d, _ = cg_shard.sample_amplitudes_sharded(
                syst_g, plan, mesh2, key=None, tol=1e-10, maxiter=200,
                band_axis="band")
            diff = jax.jit(lambda x, y: jnp.max(jnp.abs(x - y)))(
                a_2d, jax.device_put(a_ref, NamedSharding(mesh2, P())))
            err_2d = float(jax.device_get(diff))
        assert err_2d < 1e-8, f"2-D mesh CG mismatch across hosts: {err_2d}"
    print(f"MULTIHOST OK pid={pid} sht_err={err:.2e} cg_err={cg_err:.2e} "
          f"cg2d_err={err_2d:.2e}", flush=True)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]),
            sys.argv[3] if len(sys.argv) > 3 else "localhost:12387")
