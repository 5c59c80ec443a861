"""Fully-jitted Gibbs iteration (sampling/tpu_gibbs.py): one jit for
amplitudes + Cl + spectral indices + mixing rebuild, and index recovery.

Reference: the commander.f90:182-254 loop body (minus TOD) as a single
XLA-compiled function."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.model.cl import ClModelConfig
from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sampling import gibbs as gibbs_mod
from commander_tpu.sampling import tpu_gibbs
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask


@pytest.fixture(scope="module")
def setup():
    nside, lmax = 16, 32
    nl = lmax + 1
    npix = 12 * nside * nside
    comps = (
        DiffuseComponent(name="cmb", sed="cmb", nu_ref=100e9,
                         unit="uK_cmb"),
        DiffuseComponent(name="synch", sed="power_law", nu_ref=30e9,
                         theta0=(-3.1,)),
    )
    bps = tuple(delta_bandpass(nu) for nu in (30e9, 70e9, 143e9))
    beta_true = -2.8
    F_true = np.asarray(mixing_matrix(comps, bps,
                                      thetas=[(), (beta_true,)]))
    rng = np.random.default_rng(0)
    plan = sht.get_plan(nside, lmax)
    ell = np.arange(nl, dtype=float)
    cl = np.zeros((2, 1, nl), np.float32)
    cl[:, :, 2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
    key = jax.random.PRNGKey(5)
    a_true = np.asarray(random_alm_white(key, (2, 1, nl, nl))
                        * jnp.asarray(triangle_mask(nl, nl))) \
        * np.sqrt(cl)[..., None]
    sky = np.asarray(sht.alm2map(
        plan, jnp.einsum("bc,cslm->bslm", F_true, jnp.asarray(a_true))))
    rms = 0.5
    data = sky + rms * rng.standard_normal(sky.shape)
    sysm = amp.build_system(
        jnp.asarray(F_true), jnp.ones((3, 1, nl), jnp.float32),
        jnp.full((3, 1, npix), rms, jnp.float32), jnp.asarray(cl),
        jnp.asarray(data, jnp.float32))
    return comps, bps, plan, sysm, beta_true, lmax


def test_full_gibbs_step_recovers_beta(setup):
    comps, bps, plan, sysm, beta_true, lmax = setup
    slots = tpu_gibbs.make_index_slots(comps)
    assert len(slots) == 1 and slots[0].ci == 1
    cl_cfg = ClModelConfig(kind="binned", lmax=lmax, nmaps=1,
                           bin_starts=(0, 2, 10, 20))
    gcfg = gibbs_mod.GibbsConfig(cl_cfg=cl_cfg, cg_tol=1e-7, cg_maxiter=60)
    state = gibbs_mod.init_state(jax.random.PRNGKey(0), 2, 1, lmax, 4)

    from functools import partial
    step = jax.jit(partial(tpu_gibbs.full_gibbs_step, gcfg, comps, bps,
                           slots))
    # start the index off-truth; the jitted chain must pull it back
    th = jnp.asarray([-3.1], jnp.float32)
    key = jax.random.PRNGKey(42)
    betas = []
    for it in range(8):
        key, k = jax.random.split(key)
        state, th, sys_new = step(sysm, plan, state, th, k)
        betas.append(float(th[0]))
    est = np.mean(betas[3:])
    assert abs(est - beta_true) < 0.1, betas
    # amplitudes drawn and Cl updated inside the same jit
    assert int(state.cg_iters) > 0
    assert np.isfinite(np.asarray(state.cl_bins)).all()
