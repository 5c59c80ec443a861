"""BENCH metric: full Gibbs iteration (amplitude CG + binned Cl +
spectral indices + in-jit mixing rebuild), tutorial-shaped model at
nside 256 / lmax 512, 3 bands, TPU s/iter.

The round-1/2 ask: the spec-ind step used to be host-orchestrated; with
sampling/tpu_gibbs.py the WHOLE iteration is one jit.
"""
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband = 256, 512, 3
NITER = 10

with jax.default_device(cpu):
    from commander_tpu.instrument.bandpass import delta_bandpass
    from commander_tpu.model.cl import ClModelConfig
    from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sampling import gibbs as gibbs_mod
    from commander_tpu.sampling import tpu_gibbs
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import random_alm_white, triangle_mask
    from commander_tpu.utils import transfer

    nl = lmax + 1
    npix = 12 * nside * nside
    comps = (
        DiffuseComponent(name="cmb", sed="cmb", nu_ref=100e9,
                         unit="uK_cmb"),
        DiffuseComponent(name="synch", sed="power_law", nu_ref=30e9,
                         theta0=(-3.1,)),
        DiffuseComponent(name="dust", sed="MBB", nu_ref=353e9,
                         theta0=(1.6, 19.6)),
    )
    bps = tuple(delta_bandpass(f * 1e9) for f in (30.0, 70.0, 353.0))
    beta_true = (-2.9, 1.55, 20.5)
    F_true = np.asarray(mixing_matrix(
        comps, bps, thetas=[(), (beta_true[0],),
                            (beta_true[1], beta_true[2])]), np.float32)
    rng = np.random.default_rng(0)
    ell = np.arange(nl)
    cl = np.zeros((3, 1, nl), np.float32)
    cl[:, :, 2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
    key0 = jax.random.PRNGKey(5)
    a_true = np.asarray(random_alm_white(key0, (3, 1, nl, nl))
                        * jnp.asarray(triangle_mask(nl, nl))) \
        * np.sqrt(cl)[..., None]
    plan = sht.get_plan(nside, lmax, dtype="float32")
    sky = np.asarray(sht.alm2map(plan, jnp.einsum(
        "bc,cslm->bslm", jnp.asarray(F_true), jnp.asarray(a_true))))
    rms = 2.0
    data = (sky + rms * rng.standard_normal(sky.shape)).astype(np.float32)
    sysm = amp.build_system(jnp.asarray(F_true),
                            jnp.ones((nband, 1, nl), jnp.float32),
                            jnp.full((nband, 1, npix), rms, jnp.float32),
                            jnp.asarray(cl), jnp.asarray(data))
    slots = tpu_gibbs.make_index_slots(comps)
    bins = tuple(int(x) for x in np.unique(np.concatenate(
        [[0, 2], np.geomspace(4, lmax, 12).astype(int)])))
    cl_cfg = ClModelConfig(kind="binned", lmax=lmax, nmaps=1,
                           bin_starts=bins)
    gcfg = gibbs_mod.GibbsConfig(cl_cfg=cl_cfg, cg_tol=1e-7, cg_maxiter=60)
    state0 = gibbs_mod.init_state(jax.random.PRNGKey(0), 3, 1, lmax,
                                  len(bins))
    spec, enc = transfer.encode((plan, sysm, state0))

enc_d = jax.device_put(enc, dev)


@partial(jax.jit, static_argnums=(1,))
def chain(e, n, th0, key):
    plan, sysm, state = transfer.decode(spec, e)

    def body(i, carry):
        state, th, key = carry
        key, k = jax.random.split(key)
        state, th, _sys = tpu_gibbs.full_gibbs_step(
            gcfg, comps, bps, slots, sysm, plan, state, th, k)
        return (state, th, key)

    state, th, _ = jax.lax.fori_loop(0, n, body,
                                     (state, th0, key))
    return (th.astype(jnp.float32),
            state.cg_iters.astype(jnp.float32),
            jnp.sum(jnp.abs(state.a.real)).astype(jnp.float32))


th0 = jnp.asarray([-3.1, 1.6, 19.6], jnp.float32)
key = jax.random.PRNGKey(11)

t0 = time.perf_counter()
th, cg, chk = chain(enc_d, 2, th0, key)
th_h = np.asarray(th)
print(f"compile+2 iters: {time.perf_counter() - t0:.1f}s  "
      f"thetas={th_h}  cg_iters={float(np.asarray(cg)):.0f}", flush=True)

t0 = time.perf_counter()
th, cg, chk = chain(enc_d, 2 + NITER, th0, key)
np.asarray(th)
dt_long = time.perf_counter() - t0
t0 = time.perf_counter()
th2, cg2, chk2 = chain(enc_d, 2, th0, key)
np.asarray(th2)
dt_short = time.perf_counter() - t0
per_iter = (dt_long - dt_short) / NITER
print(f"full Gibbs (CG amp + binned Cl + {len(slots)} index draws + "
      f"mixing rebuild), nside {nside}: {per_iter * 1e3:.1f} ms/iter "
      f"-> {3600.0 / per_iter:.0f} iter/hour/chip", flush=True)
print(f"thetas after {2 + NITER} iters: {np.asarray(th)} "
      f"(truth {beta_true})", flush=True)
