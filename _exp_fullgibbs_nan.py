"""Probe: where does the fullgibbs bench NaN come from on TPU?

Rebuilds the exact _measure_fullgibbs system (bench.py) but runs ONE
full_gibbs_step un-looped with intermediate readbacks.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.model.cl import ClModelConfig
from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sampling import gibbs as gibbs_mod
from commander_tpu.sampling import tpu_gibbs
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask
from commander_tpu.utils import transfer

nside = 256
nband = 3
lmax = 2 * nside
dev = jax.devices()[0]
print("device:", dev)

with jax.default_device(jax.devices("cpu")[0]):
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
    F = np.asarray(mixing_matrix(comps, bps), np.float32)
    rng = np.random.default_rng(0)
    ell = np.arange(nl)
    cl = np.zeros((3, 1, nl), np.float32)
    cl[:, :, 2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
    a_true = np.asarray(
        random_alm_white(jax.random.PRNGKey(5), (3, 1, nl, nl))
        * jnp.asarray(triangle_mask(nl, nl))) * np.sqrt(cl)[..., None]
    plan = sht.get_plan(nside, lmax, dtype="float32")
    sky = np.asarray(sht.alm2map(plan, jnp.einsum(
        "bc,cslm->bslm", jnp.asarray(F), jnp.asarray(a_true))))
    data = (sky + 2.0 * rng.standard_normal(sky.shape)).astype(np.float32)
    sysm = amp.build_system(
        jnp.asarray(F), jnp.ones((nband, 1, nl), jnp.float32),
        jnp.full((nband, 1, npix), 2.0, jnp.float32),
        jnp.asarray(cl), jnp.asarray(data))
    slots = tpu_gibbs.make_index_slots(comps)
    bins = tuple(int(x) for x in np.unique(np.concatenate(
        [[0, 2], np.geomspace(4, lmax, 12).astype(int)])))
    gcfg = gibbs_mod.GibbsConfig(
        cl_cfg=ClModelConfig(kind="binned", lmax=lmax, nmaps=1,
                             bin_starts=bins),
        cg_tol=1e-7, cg_maxiter=60)
    state0 = gibbs_mod.init_state(jax.random.PRNGKey(0), 3, 1, lmax,
                                  len(bins))
    spec, enc = transfer.encode((plan, sysm, state0))
enc_d = jax.device_put(enc, dev)
print("slots:", slots)


@jax.jit
def one_step(e, th, key):
    plan, sysm, state = transfer.decode(spec, e)
    state, th, _s = tpu_gibbs.full_gibbs_step(
        gcfg, comps, bps, slots, sysm, plan, state, th, key)
    a = state.a
    stats = jnp.asarray([
        jnp.sum(~jnp.isfinite(a.real)) + jnp.sum(~jnp.isfinite(a.imag)),
        jnp.max(jnp.abs(a.real)),
        jnp.sum(~jnp.isfinite(state.cl_bins)),
        jnp.min(state.cl_bins), jnp.max(state.cl_bins),
        state.cg_iters.astype(jnp.float32),
        state.cg_relres.astype(jnp.float32)], jnp.float32)
    return stats, th.astype(jnp.float32)


th = jnp.asarray([-3.1, 1.6, 19.6], jnp.float32)
key = jax.random.PRNGKey(11)
for it in range(4):
    key, k = jax.random.split(key)
    t0 = time.perf_counter()
    stats, th = one_step(enc_d, th, k)
    s = np.asarray(stats)
    th_h = np.asarray(th)
    print(f"iter {it}: t={time.perf_counter()-t0:.1f}s "
          f"a_nonfinite={s[0]:.0f} |a|max={s[1]:.3e} "
          f"clb_nonfinite={s[2]:.0f} clb min/max={s[3]:.3e}/{s[4]:.3e} "
          f"cg_iters={s[5]:.0f} relres={s[6]:.3e} th={th_h}", flush=True)
