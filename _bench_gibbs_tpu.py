"""Gibbs-iteration wallclock on the real TPU (north-star: iter/hour).

Flagship model (entry()): 3 bands, cmb+synch+dust, nside 64 / lmax 128,
amplitude CG + binned C_ell draw per iteration. Chained-iteration timing
with scalar readback (bench.py methodology).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    import __graft_entry__ as g
    from commander_tpu.sampling import gibbs
    from commander_tpu.utils import transfer
    for nside, lmax in ((256, 512),):
        plan, sys, cfg, _ = g._build_problem(nside, lmax, dtype="float32")
        nbins = len(cfg.cl_cfg.bin_starts)
        state = gibbs.init_state(jax.random.PRNGKey(0), ncomp=3, nmaps=1,
                                 lmax=lmax, nbins=nbins, cl0=100.0)
        spec, enc = transfer.encode((plan, sys, state))
        enc_d = jax.device_put(enc, dev)

        @partial(jax.jit, static_argnums=1)
        def chain(e, n):
            plan, sys, s0 = transfer.decode(spec, e)
            def body(i, s):
                return gibbs.gibbs_step(cfg, sys, plan, s)
            out = jax.lax.fori_loop(0, n, body, s0)
            return jnp.sum(jnp.abs(out.a.real)).astype(jnp.float32)

        def timed(n):
            t0 = time.perf_counter()
            v = float(np.asarray(chain(enc_d, n)))
            assert np.isfinite(v)
            return time.perf_counter() - t0
        timed(1); timed(5)
        t_lo = min(timed(1) for _ in range(3))
        t_hi = min(timed(5) for _ in range(3))
        per = (t_hi - t_lo) / 4
        print(f"nside {nside} lmax {lmax}: {per*1e3:.1f} ms/Gibbs-iter "
              f"-> {3600/per:.0f} iter/hour (TPU f32, cg_maxiter={cfg.cg_maxiter})",
              flush=True)
