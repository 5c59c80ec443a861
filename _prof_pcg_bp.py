"""BASELINE config-4 demo: the BP v8 production band layout as ONE
multi-resolution CR draw on one TPU chip.

Mirrors param_BP_v8.00_full.txt:153-717: 3 low-res bands (nside 16,
lmax 64), 8 mid bands (nside 512, lmax 1500), 3 high bands (nside 1024,
lmax 3000); 5 components at lmax 3000 (COMP_LMAX_AMP03 = 3000). The
512/1024 groups run the fused Pallas OTF Legendre (tables over 2 GiB are
auto-refused; get_plan resolves OTF), the nside-16 group uses tables.

Usage: python _prof_pcg_bp.py [maxiter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 100

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
GROUPS = [  # (nside, lmax, nband, beam fwhm range deg)
    (16, 64, 3, (2.0, 8.0)),
    (512, 1500, 8, (0.2, 0.6)),
    (1024, 3000, 3, (0.08, 0.23)),
]
ncomp = 5
lmax_c = max(lm for _, lm, _, _ in GROUPS)

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sampling import multires
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer

    nl_c = lmax_c + 1
    rng = np.random.default_rng(0)
    ell_c = np.arange(nl_c)
    cl = np.zeros((ncomp, 1, nl_c), np.float32)
    cl[:, :, 2:] = 100.0 / (ell_c[2:] * (ell_c[2:] + 1.0))

    groups, plans = [], []
    for ns, lm, nb, (f0, f1) in GROUPS:
        npix, nl = 12 * ns * ns, lm + 1
        F = 1.0 + rng.uniform(0.2, 1.0, (nb, ncomp)).astype(np.float32)
        ell = np.arange(nl)
        bl = np.exp(-0.5 * ell * (ell + 1)
                    * np.radians(rng.uniform(f0, f1, nb))[:, None] ** 2)
        bl = bl.astype(np.float32)[:, None, :]
        rms = rng.uniform(0.5, 3.0, (nb, 1, npix)).astype(np.float32)
        data = rng.normal(0, 1, (nb, 1, npix)).astype(np.float32)
        sys_g = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                                 jnp.asarray(rms),
                                 jnp.asarray(cl[..., :nl]),
                                 jnp.asarray(data))
        plan_g = sht.get_plan(ns, lm, dtype="float32")   # auto table/OTF
        groups.append(sys_g)
        plans.append(plan_g)
        print(f"group nside {ns} lmax {lm}: {nb} bands, "
              f"{'table' if plan_g.lam0 is not None else 'OTF-pallas'}",
              flush=True)
    ms = multires.build_multi_system(groups, jnp.asarray(cl))
    spec, enc = transfer.encode((ms, tuple(plans)))
enc_d = jax.device_put(enc, dev)


@partial(jax.jit, static_argnums=1)
def solve(e, n):
    ms, plans = transfer.decode(spec, e)
    a, res = multires.sample_amplitudes_multi(
        ms, plans, key=jax.random.PRNGKey(1), tol=1e-6, maxiter=n)
    return (res.iters.astype(jnp.float32),
            res.rel_res.astype(jnp.float32))


for n in (3, maxiter):
    t0 = time.perf_counter()
    it, rr = solve(enc_d, n)
    it = float(np.asarray(it))
    rr = float(np.asarray(rr))
    dt = time.perf_counter() - t0
    print(f"maxiter={n:3d}: {dt:8.2f} s wall  iters={it:.0f} "
          f"relres={rr:.2e}  ({dt / max(it, 1):.2f} s/iter incl "
          f"compile+rhs)", flush=True)
