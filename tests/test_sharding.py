"""Multi-device sharding tests on the virtual CPU mesh (8 devices).

Covers the parallelism strategies of SURVEY.md §2.11:
  P1 chain-parallel Gibbs (vmap over sharded chain axis)
  P3 band sharding inside the CG operator
  P4 scan sharding of the TOD step with psum-reduced binned maps
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from commander_tpu.sphere import healpix

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def test_dryrun_multichip():
    import sys as _s
    _s.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(len(jax.devices()))


def test_scan_sharded_tod_step():
    from commander_tpu.tod.process import TodConfig, init_tod_state, process_tod
    from commander_tpu.tod.sim import simulate_tod

    nside = 8
    ndev = len(jax.devices())
    rng = np.random.default_rng(0)
    sky = rng.standard_normal((1, 12 * nside * nside)) * 30 + 80
    block, truth = simulate_tod(nside, sky, nscan=ndev * 2, ndet=2,
                                ntod=1024, seed=1)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("scan",))
    scan_sharded = NamedSharding(mesh, P("scan"))
    repl = NamedSharding(mesh, P())

    block = jax.tree.map(
        lambda x: jax.device_put(x, scan_sharded)
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ndev * 2
        else x, block)
    state = init_tod_state(block)
    cfg = TodConfig(nside=nside, nu=30e9)
    pvec = jax.device_put(jnp.asarray(healpix.pix2vec_ring(nside)), repl)
    skyj = jax.device_put(jnp.asarray(sky), repl)

    @jax.jit
    def step(st, k):
        return process_tod(cfg, block, st, skyj, pvec, k)

    with mesh:
        st, prod = step(state, jax.random.PRNGKey(0))
        st, prod = step(st, jax.random.PRNGKey(1))
        jax.block_until_ready(prod["map"])
    # the binned map (a cross-scan reduction -> psum under sharding) is
    # replicated and finite
    m = np.asarray(prod["map"])
    assert np.isfinite(m).all()
    assert abs(float(jnp.mean(st.gain)) - 1.0) < 0.05
