"""Numerics utilities: Powell minimizer, Wigner 3j, power-law Cl draws."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.ops.powell import powell
from commander_tpu.ops.wigner3j import wigner_3j, wigner_3j_series


def test_powell_rosenbrock():
    f = lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
    x, fx, it = powell(f, [-1.2, 1.0], maxiter=200)
    assert fx < 1e-8
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)


def test_powell_quadratic():
    A = np.array([[3.0, 1.0], [1.0, 2.0]])
    b = np.array([1.0, -2.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    x, fx, _ = powell(f, [0.0, 0.0])
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-5)


def test_wigner3j_known_values():
    # (1 1 0; 0 0 0) = -1/sqrt(3)
    assert abs(wigner_3j(1, 1, 0, 0, 0, 0) + 1 / np.sqrt(3)) < 1e-12
    # (2 2 2; 0 0 0) = -sqrt(2/35)
    assert abs(wigner_3j(2, 2, 2, 0, 0, 0) + np.sqrt(2.0 / 35.0)) < 1e-12
    # (2 0 2; 0 0 0) = 1/sqrt(5)
    assert abs(wigner_3j(2, 0, 2, 0, 0, 0) - 1 / np.sqrt(5)) < 1e-12
    # odd sum vanishes at m=0
    assert wigner_3j(1, 1, 1, 0, 0, 0) == 0.0
    # orthogonality: sum_l1 (2l1+1) 3j^2 = 1
    lmin, w = wigner_3j_series(10, 7, 3, -2)
    ells = np.arange(lmin, 18)
    assert abs(np.sum((2 * ells + 1) * w**2) - 1.0) < 1e-10


def test_wigner3j_vs_gaunt_symmetry():
    # permutation symmetry of columns (even perms identical)
    a = wigner_3j(6, 4, 5, 1, -3, 2)
    b = wigner_3j(4, 5, 6, -3, 2, 1)
    assert abs(a - b) < 1e-12


def test_powerlaw_cl_amp_recovery():
    from commander_tpu.model.cl import (ClModelConfig, cl_eval,
                                        sample_cl_powerlaw_amp)
    from commander_tpu.sphere.alm import random_alm_white, triangle_mask
    from commander_tpu.model.cl import apply_sqrtS
    lmax = 48
    cfg = ClModelConfig(kind="power_law", lmax=lmax, nmaps=1, ell_pivot=10)
    amp_true, beta_true = 250.0, -0.6
    cl = cl_eval(cfg, {"amp": jnp.asarray([amp_true]),
                       "beta": jnp.asarray([beta_true])})
    key = jax.random.PRNGKey(0)
    tri = jnp.asarray(triangle_mask(lmax + 1, lmax + 1))
    a = apply_sqrtS(cl[None], random_alm_white(key, (1, 1, lmax + 1, lmax + 1))
                    )[0] * tri
    draws = [float(sample_cl_powerlaw_amp(jax.random.PRNGKey(s), cfg, a,
                                          jnp.asarray([beta_true]))[0])
             for s in range(24)]
    m = np.mean(draws)
    # posterior mean ~ amp_true within ~ 3 sigma/sqrt(n) (sigma ~ amp*sqrt(2/ndof))
    assert abs(m / amp_true - 1.0) < 0.15, m


def test_relquad_template():
    from commander_tpu.model.relquad import relquad_template, solar_dipole_map
    t = relquad_template(16, 100e9)
    assert t.shape == (12 * 256,)
    assert abs(t.mean()) < 1e-10              # pure quadrupole, no monopole
    assert 0.1 < t.max() < 10.0               # ~ uK level
    d = solar_dipole_map(16)
    assert abs(d.max() - 3362.08) / 3362.08 < 0.01


def test_te_invwishart_moments():
    """IW draws around a known TE-correlated truth: posterior mean of C
    approaches S/(nu - p - 1) ~ C_true for many modes."""
    from commander_tpu.model.cl import (ClModelConfig, bin_index_table,
                                        sample_cl_binned_invwishart_TE,
                                        apply_sqrtS_TE)
    from commander_tpu.sphere.alm import random_alm_white, triangle_mask
    lmax = 40
    cfg = ClModelConfig(kind="binned", lmax=lmax, nmaps=3, bin_starts=(0, 20))
    rng = np.random.default_rng(0)
    C_true = np.array([[100.0, 30.0], [30.0, 20.0]])
    clb_true = 5.0
    nb = len(cfg.bin_starts)
    cl_te = np.broadcast_to(C_true, (nb, 2, 2)).copy()
    cl_b = np.full(nb, clb_true)
    idx = jnp.asarray(bin_index_table(cfg))
    tri = jnp.asarray(triangle_mask(lmax + 1, lmax + 1))
    key = jax.random.PRNGKey(1)
    a = random_alm_white(key, (3, lmax + 1, lmax + 1)) * tri
    a = apply_sqrtS_TE(jnp.asarray(cl_te), jnp.asarray(cl_b), idx, a)
    draws_te = []
    draws_b = []
    for s in range(40):
        te, b = sample_cl_binned_invwishart_TE(jax.random.PRNGKey(10 + s),
                                               cfg, a)
        draws_te.append(np.asarray(te))
        draws_b.append(np.asarray(b))
    m_te = np.mean(draws_te, axis=0)
    m_b = np.mean(draws_b, axis=0)
    # ~1700 modes per bin -> posterior tight around the empirical scatter
    for b_i in range(nb):
        np.testing.assert_allclose(m_te[b_i], C_true, rtol=0.25, atol=4.0)
    np.testing.assert_allclose(m_b, clb_true, rtol=0.25)
    # TE correlation sign preserved
    assert np.all(m_te[:, 0, 1] > 0)


def test_bandpass_unit_scales_and_sz():
    """mK/K_cmb unit scales (comm_bp_mod unit_scale :122-126), the thermal
    SZ conversion (a2sz family :227-263), and profile trimming thresholds
    (:99-116)."""
    import numpy as np
    from commander_tpu.instrument.bandpass import (Bandpass,
                                                   band_sz_conversion,
                                                   sz_thermo, trim_profile,
                                                   tophat_bandpass)
    nu = np.linspace(80e9, 120e9, 101)
    tau = np.ones_like(nu)
    uK = Bandpass(nu=nu, tau=tau, unit="uK_cmb")
    mK = Bandpass(nu=nu, tau=tau, unit="mK_cmb")
    K = Bandpass(nu=nu, tau=tau, unit="K_cmb")
    _, w_u = uK.weights(0.0)
    _, w_m = mK.weights(0.0)
    _, w_K = K.weights(0.0)
    np.testing.assert_allclose(np.asarray(w_m), np.asarray(w_u) * 1e-3,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w_K), np.asarray(w_u) * 1e-6,
                               rtol=1e-12)
    # SZ: f(x) -> -2 at nu -> 0 (the RJ-limit decrement -2y), null at
    # ~217.5 GHz
    assert -2.01 < float(sz_thermo(1e9)) < -1.97
    assert abs(float(sz_thermo(217.5e9))) < 0.05
    a2sz = band_sz_conversion(uK)
    # 100 GHz band: y=1 corresponds to ~ -4.1e6 uK_cmb x f/4 ~ -1e6 scale
    assert -6e6 < a2sz < -2e6
    # trimming: HFI_cmb drops tau below 1e-7 of peak
    tau2 = tau.copy(); tau2[:10] = 1e-9
    nu_t, tau_t = trim_profile(nu, tau2, "HFI_cmb")
    assert len(nu_t) == len(nu) - 10
    nu_t, tau_t = trim_profile(nu, tau2, "LFI")
    assert len(nu_t) == len(nu)


def test_spindust_sed_matches_reference_formula():
    """sed_spindust == the reference evalSED (comm_spindust_comp_mod.f90:
    178-184): j(s nu)/j(s nu_ref) * (nu_ref/nu)^2 with s = nu_p0/nu_p."""
    import numpy as np
    from commander_tpu.model import seds

    saved = (seds._SPD_LOGNU, seds._SPD_LOGJ, seds._SPD_PEAK)
    try:
        nu_t = np.geomspace(0.1e9, 3000e9, 800)
        j_t = np.exp(-0.5 * ((np.log(nu_t) - np.log(30e9)) / 0.7) ** 2)
        seds.set_spindust_template(nu_t, j_t, 30e9)

        def ref_formula(nu, nu_ref, nu_p):
            s = 30e9 / nu_p
            f = lambda x: np.interp(np.log(x), np.log(nu_t), np.log(j_t))
            return np.exp(f(s * nu) - f(s * nu_ref)) * (nu_ref / nu) ** 2

        nu_ref = 22e9
        for nu_p in (18e9, 30e9, 45e9):
            for nu in (10e9, 22e9, 30e9, 60e9, 90e9):
                got = float(seds.sed_spindust(nu, nu_ref, nu_p))
                want = ref_formula(nu, nu_ref, nu_p)
                assert abs(got - want) < 1e-4 * abs(want) + 1e-12
        got2 = float(seds.sed_spindust2(60e9, nu_ref, 30e9, 1.5))
        want2 = ref_formula(60e9, nu_ref, 30e9) * (60e9 / nu_ref) ** 1.5
        assert abs(got2 - want2) < 1e-4 * abs(want2)
    finally:
        seds._SPD_LOGNU, seds._SPD_LOGJ, seds._SPD_PEAK = saved


def test_load_spindust_template_ascii(tmp_path):
    """ASCII SpDust2-format loader: GHz -> Hz, peak at max, '#' comments."""
    import numpy as np
    from commander_tpu.model import seds

    saved = (seds._SPD_LOGNU, seds._SPD_LOGJ, seds._SPD_PEAK)
    try:
        nu_ghz = np.geomspace(0.5, 500, 200)
        j = np.exp(-0.5 * ((np.log(nu_ghz) - np.log(25.0)) / 0.5) ** 2)
        f = tmp_path / "spdust2_cnm.dat"
        lines = ["# SpDust2 CNM emissivity\n"] + [
            f"{a:.6e}  {b:.6e}\n" for a, b in zip(nu_ghz, j)]
        f.write_text("".join(lines))
        seds.load_spindust_template(str(f))
        assert abs(seds._SPD_PEAK - nu_ghz[np.argmax(j)] * 1e9) \
            < 1e-5 * seds._SPD_PEAK
        # SED at the native peak with nu_p at the peak = 1 at nu_ref = peak
        v = float(seds.sed_spindust(seds._SPD_PEAK, seds._SPD_PEAK,
                                    seds._SPD_PEAK))
        assert abs(v - 1.0) < 1e-5
    finally:
        seds._SPD_LOGNU, seds._SPD_LOGJ, seds._SPD_PEAK = saved


def test_bandpass_hfi_profile_matches_reference_formulas():
    """Intensity-defined (HFI/DIRBE) bandpass weights reproduce the
    reference's update_tau + SED2F recipes (comm_bp_mod.f90:200-322):
      uK_cmb:  F = int tau b'_RJ S / int tau b'_cmb
      MJy/sr:  F = int tau b'_RJ S / int tau (nu_c/nu)   (IRAS convention)
    with b'_RJ = 2 k nu^2/c^2 and S in uK_RJ."""
    import numpy as np
    import jax.numpy as jnp
    from commander_tpu.instrument.bandpass import (Bandpass, rj_to_MJysr,
                                                   thermo_to_rj)

    nu = np.linspace(300e9, 500e9, 401)          # uniform grid: trapezoid ok
    tau = np.exp(-0.5 * ((nu - 400e9) / 40e9) ** 2)
    S = (nu / 350e9) ** 1.7                      # some SED in uK_RJ
    bprj = nu ** 2                               # b'_RJ up to constants

    bp_cmb = Bandpass(nu=nu, tau=tau, unit="uK_cmb", profile_type="HFI_cmb")
    got = float(bp_cmb.integrate(jnp.asarray(S)))
    bcmb = bprj * np.asarray(thermo_to_rj(nu))   # b'_cmb / (2k/c^2)
    want = np.trapezoid(tau * bprj * S, nu) / np.trapezoid(tau * bcmb, nu)
    assert abs(got - want) < 1e-6 * abs(want)

    bp_mjy = Bandpass(nu=nu, tau=tau, unit="MJy/sr", profile_type="DIRBE")
    got = float(bp_mjy.integrate(jnp.asarray(S)))
    nu_c = bp_mjy.nu_c
    want = np.trapezoid(tau * np.asarray(rj_to_MJysr(nu)) * S, nu) \
        / np.trapezoid(tau * (nu_c / nu), nu)
    assert abs(got - want) < 1e-6 * abs(want)

    # RJ-defined profile (LFI): reference LFI branch
    # F = int tau S / int tau dT_RJ/dT_cmb
    bp_lfi = Bandpass(nu=nu, tau=tau, unit="uK_cmb", profile_type="LFI")
    got = float(bp_lfi.integrate(jnp.asarray(S)))
    want = np.trapezoid(tau * S, nu) / np.trapezoid(
        tau * np.asarray(thermo_to_rj(nu)), nu)
    assert abs(got - want) < 1e-6 * abs(want)
