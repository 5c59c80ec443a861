"""Per-detector bandpass machinery (tod/bandpass_mh.py): the reference's
ndelta proposal flow (commander.f90:299-335 + sample_bp,
comm_tod_bandpass_mod.f90:28-79) with nside-independent proposal cost.
"""
import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.instrument.bandpass import Bandpass
from commander_tpu.model.mixing import DiffuseComponent
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask
from commander_tpu.tod import bandpass_mh as BM
from commander_tpu.tod import model as M
from commander_tpu.tod.sim import simulate_tod

NSIDE, LMAX = 8, 16


def _tophat_bp(nu0, width=4e9, n=41):
    nu = np.linspace(nu0 - width / 2, nu0 + width / 2, n)
    return Bandpass(nu=nu, tau=np.ones(n), unit="uK_RJ",
                    profile_type="LFI")


def _setup(delta_true):
    """Synch-like steep sky observed through per-det tophat bandpasses
    with injected per-det shifts delta_true (Nd,)."""
    nl = LMAX + 1
    plan = sht.get_plan(NSIDE, LMAX)
    comps = [DiffuseComponent("synch", "power_law", 30e9, theta0=(-3.0,))]
    det_bps = tuple(_tophat_bp(30e9) for _ in range(2))
    rng = np.random.default_rng(0)
    a = np.asarray(random_alm_white(jax.random.PRNGKey(1), (1, 1, nl, nl))
                   * jnp.asarray(triangle_mask(nl, nl))) * 50.0
    comp_map = np.asarray(sht.alm2map(plan, jnp.asarray(a[0])))  # (1, npix)
    # per-det true mixing at the injected shifts
    F_true = np.array([float(np.asarray(BM.det_mixing(
        comps, det_bps, [(-3.0,)], jnp.asarray([dd, dd]))[d, 0]))
        for d, dd in enumerate(delta_true)])
    block, _ = simulate_tod(NSIDE, comp_map * 0.0, nscan=4, ndet=2,
                            ntod=2048, sigma0=1.0, gain0=1.0, seed=3)
    s_unit = M.project_sky(jnp.asarray(comp_map), block.pix, block.psi,
                           False)                        # (Ns, Nd, Nt)
    tod = F_true[None, :, None] * np.asarray(s_unit) \
        + 1.0 * rng.standard_normal(np.asarray(s_unit).shape)
    import dataclasses
    block = dataclasses.replace(block, tod=jnp.asarray(tod))
    from commander_tpu.tod.process import init_tod_state
    tstate = init_tod_state(block)
    tstate = dataclasses.replace(tstate, gain=jnp.ones_like(tstate.gain),
                                 sigma0=jnp.ones_like(tstate.sigma0))
    comp_tod = s_unit[None]                              # (C=1, Ns, Nd, Nt)
    s_stat = jnp.zeros_like(block.tod)
    return comps, det_bps, comp_tod, s_stat, block, tstate


def test_det_mixing_shift_direction():
    comps = [DiffuseComponent("synch", "power_law", 30e9, theta0=(-3.0,))]
    det_bps = tuple(_tophat_bp(30e9) for _ in range(2))
    F0 = np.asarray(BM.det_mixing(comps, det_bps, [(-3.0,)],
                                  jnp.zeros(2)))
    Fp = np.asarray(BM.det_mixing(comps, det_bps, [(-3.0,)],
                                  jnp.asarray([1e9, -1e9])))
    # shifting the band UP lowers the response of a steep falling spectrum
    assert Fp[0, 0] < F0[0, 0] < Fp[1, 0]


def test_sample_bp_det_recovers_relative_shift():
    delta_true = np.array([0.8e9, -0.8e9])
    comps, det_bps, comp_tod, s_stat, block, tstate = _setup(delta_true)
    key = jax.random.PRNGKey(7)
    cur = jnp.zeros(2)
    accepted = 0
    for it in range(25):
        key, k = jax.random.split(key)
        cur, c2, nacc = BM.sample_bp_det(
            k, comps, [(-3.0,)], det_bps, jnp.asarray(comp_tod), s_stat,
            block, tstate, cur, n_prop=2, sigma_prop=0.3e9)
        accepted += nacc
    cur = np.asarray(cur)
    assert accepted > 0
    # relative (zero-mean) part of the injected shift recovered
    zt = delta_true - delta_true.mean()
    assert abs(cur[0] - zt[0]) < 0.4e9, cur
    assert cur[0] > 0 > cur[1]


def test_project_sky_per_det_maps():
    rng = np.random.default_rng(2)
    npix = 12 * NSIDE * NSIDE
    maps = jnp.asarray(rng.standard_normal((2, 1, npix)))
    pix = jnp.asarray(rng.integers(0, npix, (3, 2, 64)))
    psi = jnp.zeros((3, 2, 64))
    s = M.project_sky(maps, pix, psi, False)
    assert s.shape == (3, 2, 64)
    np.testing.assert_allclose(np.asarray(s[:, 0]),
                               np.asarray(maps[0, 0])[np.asarray(pix[:, 0])])
    np.testing.assert_allclose(np.asarray(s[:, 1]),
                               np.asarray(maps[1, 0])[np.asarray(pix[:, 1])])
