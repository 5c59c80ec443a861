"""Physical-dust SED: table interpolation + U-distribution integral.

Reference: comm_physdust_comp_mod.f90 evalSED (:188-253) — multi-grain
emission tables over (wavelength, logU), Aniano et al. power-law U
distribution, (nu_ref/nu)^3 brightness normalization.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from commander_tpu.model import seds


@pytest.fixture(autouse=True)
def _restore_physdust():
    saved = (seds._PD_LOGWAV, seds._PD_LOGU, seds._PD_LOGE, seds._PD_AMPS,
             dict(seds._PD_PARS))
    yield
    (seds._PD_LOGWAV, seds._PD_LOGU, seds._PD_LOGE, seds._PD_AMPS) = saved[:4]
    seds._PD_PARS = saved[4]


def test_physdust_normalized_at_reference():
    v = float(seds.sed_physdust(353e9, 353e9, 0.0))
    assert np.isclose(v, 1.0, rtol=1e-12)


def test_physdust_shape_and_cutoff():
    nu = jnp.asarray([1e9, 30e9, 100e9, 353e9, 857e9])
    s = np.asarray(seds.sed_physdust(nu, 353e9, 0.0))
    assert s[0] == 0.0                      # < 2 GHz cutoff
    assert np.all(s[1:] > 0)
    # dust rises with frequency in RJ units below the peak
    assert s[1] < s[2] < s[3]


def test_physdust_umin_changes_sed():
    s_cold = float(seds.sed_physdust(100e9, 353e9, -0.5))
    s_hot = float(seds.sed_physdust(100e9, 353e9, 0.5))
    assert not np.isclose(s_cold, s_hot, rtol=1e-3)


def test_physdust_udistribution_integral():
    # gamma > 0 activates the U integral; alpha=1 exercises the special case
    seds._PD_PARS = {"log_umax": 0.5, "gamma": 0.5, "alpha": 2.0}
    s_mix = float(seds.sed_physdust(100e9, 353e9, -0.3))
    seds._PD_PARS = {"log_umax": 0.5, "gamma": 0.0, "alpha": 2.0}
    s_delta = float(seds.sed_physdust(100e9, 353e9, -0.3))
    assert np.isfinite(s_mix) and s_mix > 0
    assert not np.isclose(s_mix, s_delta, rtol=1e-4)
    seds._PD_PARS = {"log_umax": 0.5, "gamma": 0.3, "alpha": 1.0}
    s_a1 = float(seds.sed_physdust(100e9, 353e9, -0.3))
    assert np.isfinite(s_a1) and s_a1 > 0


def test_physdust_custom_table_single_mbb_matches_analytic():
    """Install a single-grain table of exact MBB emission; the physdust SED
    must reproduce sed_mbb."""
    beta, T0 = 1.6, 19.6
    wav = np.geomspace(10.0, 3e6, 800)
    nu = seds.C_LIGHT / (wav * 1e-6)
    logU = np.linspace(-1.0, 1.0, 5)
    # nu*I_nu with T independent of U so the table is exactly one MBB
    x = seds.H_PLANCK * nu / (seds.K_BOLTZ * T0)
    log_e = np.broadcast_to(
        ((4.0 + beta) * np.log(nu) - np.log(np.expm1(x)))[None, :, None],
        (1, len(wav), len(logU)))
    seds.set_physdust_model(wav, logU, log_e, [1.0], gamma=0.0)
    for f in (30e9, 100e9, 217e9, 545e9):
        got = float(seds.sed_physdust(f, 353e9, 0.0))
        want = float(seds.sed_mbb(f, 353e9, beta, T0))
        assert np.isclose(got, want, rtol=2e-3), (f, got, want)
