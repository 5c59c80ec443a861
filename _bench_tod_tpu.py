"""TOD Gibbs pass wallclock on the real TPU (BASELINE config 5 direction).

BeyondPlanck-scale unit: one band's TOD step (gain -> PSD -> n_corr ->
chi^2 -> binning) over scans x detectors x samples, all inside one jit.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside = 64
nscan, ndet, ntod = 32, 4, 2 ** 16      # 8.4M samples per block
with jax.default_device(cpu):
    from commander_tpu.tod import model as M
    from commander_tpu.tod.process import TodConfig, process_tod
    from commander_tpu.tod.sim import simulate_tod
    from commander_tpu.sphere import healpix
    from commander_tpu.utils import transfer
    npix = 12 * nside * nside
    rng = np.random.default_rng(0)
    sky = rng.standard_normal((1, npix)).astype(np.float64) * 50
    block, truth = simulate_tod(nside, sky, nscan=nscan, ndet=ndet,
                                ntod=ntod, nu=30e9)
    cfg = TodConfig(nside=nside, nu=30e9)
    from commander_tpu.tod.process import init_tod_state
    state = init_tod_state(block)
    pvec = healpix.pix2vec_ring(nside)
    f32 = lambda x: jax.tree.map(
        lambda v: v.astype(np.float32) if hasattr(v, 'dtype')
        and v.dtype == np.float64 else v, x)
    spec, enc = transfer.encode((block, state, jnp.asarray(sky),
                                 jnp.asarray(pvec)))
enc_d = jax.device_put(enc, dev)

@partial(jax.jit, static_argnums=1)
def step(e, n):
    block, state, sky, pvec = transfer.decode(spec, e)
    def body(i, st):
        st2, prod = process_tod(cfg, block, st, sky, pvec,
                                jax.random.fold_in(jax.random.PRNGKey(0), i))
        return st2
    st = jax.lax.fori_loop(0, n, body, state)
    return jnp.sum(st.gain).astype(jnp.float32)

def timed(n):
    t0 = time.perf_counter()
    v = float(np.asarray(step(enc_d, n)))
    assert np.isfinite(v)
    return time.perf_counter() - t0

t0 = time.perf_counter(); timed(1)
print(f"compile+first {time.perf_counter()-t0:.1f} s", flush=True)
t_lo = min(timed(1) for _ in range(3))
t_hi = min(timed(5) for _ in range(3))
per = (t_hi - t_lo) / 4
ns = nscan * ndet * ntod
print(f"TOD pass {nscan}x{ndet}x{ntod} ({ns/1e6:.1f}M samp): "
      f"{per*1e3:.1f} ms -> {ns/per/1e6:.0f} Msamp/s", flush=True)
