"""Spectral-index (nonlinear) sampler tests against analytic posteriors."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.model.mixing import DiffuseComponent, mixing_element
from commander_tpu.sampling import specind

GHZ = 1e9


def test_cdf_invert_gaussian():
    # inversion sampler on an exact Gaussian lnL must reproduce its moments
    grid = jnp.linspace(-5.0, 5.0, 201)
    mu, sig = 0.7, 0.4
    lnl = -0.5 * ((grid - mu) / sig) ** 2
    lnl = jnp.broadcast_to(lnl, (4000, 201))
    keys = jax.random.PRNGKey(0)
    draws = specind._cdf_invert(keys, lnl, grid)
    assert abs(np.mean(np.asarray(draws)) - mu) < 0.02
    assert abs(np.std(np.asarray(draws)) - sig) < 0.02


def _setup_pixel_problem(beta_true=-3.0, rms=0.05, npix=512, seed=0):
    comp = DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(beta_true,))
    bps = [delta_bandpass(f * GHZ, unit="uK_RJ") for f in (10, 23, 33, 44, 70)]
    rng = np.random.default_rng(seed)
    amp = jnp.asarray(np.abs(rng.standard_normal((1, npix))) * 50 + 30)
    F_true = jnp.stack([mixing_element(comp, bp, (beta_true,)) for bp in bps])
    data = F_true[:, None, None] * amp[None] \
        + rms * rng.standard_normal((len(bps), 1, npix))
    inv_rms2 = jnp.full((len(bps), 1, npix), 1.0 / rms**2)
    return comp, bps, jnp.asarray(data), amp, inv_rms2


def test_pixel_specind_recovers_truth():
    beta_true = -3.0
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(beta_true)
    cfg = specind.SpecIndConfig(grid_min=-4.5, grid_max=-1.5, ngrid=256)
    key = jax.random.PRNGKey(1)
    beta = specind.sample_specind_pixel(key, comp, bps, cfg, data, amp,
                                        inv_rms2, (beta_true,), which=0)
    b = np.asarray(beta)
    assert abs(b.mean() - beta_true) < 0.01
    # per-pixel posterior width should be tiny at SNR ~ 1000
    assert b.std() < 0.05


def test_fullsky_specind():
    beta_true = -2.8
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(beta_true, rms=2.0)
    cfg = specind.SpecIndConfig(grid_min=-4.0, grid_max=-2.0, ngrid=256)
    draws = []
    for s in range(16):
        b = specind.sample_specind_fullsky(jax.random.PRNGKey(s), comp, bps,
                                           cfg, data, amp, inv_rms2,
                                           (beta_true,), which=0)
        draws.append(float(b))
    assert abs(np.mean(draws) - beta_true) < 0.01


def test_region_specind():
    beta_true = -3.0
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(beta_true)
    npix = data.shape[-1]
    region = jnp.asarray(np.arange(npix) % 8, dtype=jnp.int32)
    cfg = specind.SpecIndConfig(grid_min=-4.5, grid_max=-1.5, ngrid=128)
    th_reg, th_pix = specind.sample_specind_regions(
        jax.random.PRNGKey(2), comp, bps, cfg, data, amp, inv_rms2,
        (beta_true,), region, 8)
    assert th_reg.shape == (8,)
    # posterior per region is narrower than one grid cell; accuracy is
    # limited by the grid spacing (3.0/127 ~ 0.024)
    assert np.abs(np.asarray(th_reg) - beta_true).max() < 0.05
    np.testing.assert_allclose(np.asarray(th_pix), np.asarray(th_reg)[np.asarray(region)])


def test_prior_dominates_when_no_data():
    comp = DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.0,))
    bps = [delta_bandpass(23 * GHZ, unit="uK_RJ")]
    npix = 256
    cfg = specind.SpecIndConfig(grid_min=-5.0, grid_max=-1.0, ngrid=256,
                                prior_mean=-3.2, prior_std=0.1)
    res = jnp.zeros((1, 1, npix))
    amp = jnp.zeros((1, npix))          # no signal -> posterior = prior
    inv_rms2 = jnp.ones((1, 1, npix))
    beta = specind.sample_specind_pixel(jax.random.PRNGKey(3), comp, bps, cfg,
                                        res, amp, inv_rms2, (-3.0,), which=0)
    b = np.asarray(beta)
    assert abs(b.mean() + 3.2) < 0.02
    assert abs(b.std() - 0.1) < 0.02


def test_alm_specind_sampler_improves_fit():
    """alm-space MH on a smooth beta field reduces chi2 toward the truth."""
    from commander_tpu.sphere import sht
    from commander_tpu.sphere import healpix
    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax)
    npix = 12 * nside * nside
    comp = DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.0,))
    bps = [delta_bandpass(f * GHZ, unit="uK_RJ") for f in (10, 23, 44, 70)]
    rng = np.random.default_rng(0)
    # smooth true beta field: monopole + dipole in z
    z = healpix.pix2vec_ring(nside)[:, 2]
    beta_true = -3.0 + 0.2 * z
    amp = jnp.asarray(np.abs(rng.standard_normal((1, npix))) * 60 + 40)
    from commander_tpu.model.mixing import mixing_element
    F_true = jnp.stack([mixing_element(comp, bp, (jnp.asarray(beta_true),))
                        for bp in bps])
    rms = 0.5
    data = F_true[:, None, :] * amp[None] \
        + rms * rng.standard_normal((4, 1, npix))
    inv_rms2 = jnp.full((4, 1, npix), 1.0 / rms**2)
    cfg = specind.SpecIndConfig(grid_min=-4, grid_max=-2, ngrid=8,
                                prior_mean=-3.0, prior_std=1.0)
    import jax
    from commander_tpu.sphere.alm import alm_dot
    t0 = jnp.zeros((3, 3), jnp.complex128).at[0, 0].set(
        -3.0 * np.sqrt(4 * np.pi))
    t, theta_map, n_acc = specind.sample_specind_alm(
        jax.random.PRNGKey(0), comp, bps, cfg, plan, jnp.asarray(data),
        amp, inv_rms2, (-3.0,), t0, which=0, lmax_ind=2, step=0.1,
        nsteps=30)
    # the sampler should move toward the true smooth field
    err0 = np.abs(np.asarray(theta_map) - beta_true)
    assert n_acc > 0
    assert err0.mean() < 0.1, err0.mean()


def test_ridge_marginal_lnl_recover_truth():
    """Amplitude-marginalized lnL types (ridge/marginal) peak at the true
    index: comp_lnL_marginal_diagonal, comm_diffuse_comp_mod.f90:4522-4567.
    The data passed is the residual INCLUDING the component (the amplitude
    is marginalized analytically), unlike the chisq path."""
    beta_true = -3.1
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(beta_true)
    for lt in ("ridge", "marginal"):
        cfg = specind.SpecIndConfig(grid_min=-4.5, grid_max=-1.5, ngrid=256,
                                    lnl_type=lt)
        beta = specind.sample_specind_pixel(
            jax.random.PRNGKey(2), comp, bps, cfg, data, amp, inv_rms2,
            (beta_true,), which=0)
        b = np.asarray(beta)
        assert abs(b.mean() - beta_true) < 0.02, lt
        assert np.all(np.isfinite(b)), lt


def test_ridge_vs_marginal_determinant_term():
    # the grids differ exactly by the 0.5*log(M^T N^-1 M) determinant term
    beta_true = -3.0
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(beta_true)
    grid = jnp.linspace(-4.0, -2.0, 32)
    cfg_r = specind.SpecIndConfig(-4.0, -2.0, 32, lnl_type="ridge")
    cfg_m = specind.SpecIndConfig(-4.0, -2.0, 32, lnl_type="marginal")
    lr = specind._grid_lnL_pixel(comp, bps, cfg_r, data, amp, inv_rms2,
                                 (beta_true,), 0)
    lm = specind._grid_lnL_pixel(comp, bps, cfg_m, data, amp, inv_rms2,
                                 (beta_true,), 0)
    F = jnp.stack([mixing_element(comp, bp, (grid,)) for bp in bps])
    MNM = jnp.einsum("bg,bsp->pg", F**2, inv_rms2)
    np.testing.assert_allclose(np.asarray(lm - lr),
                               0.5 * np.log(np.asarray(MNM)), rtol=1e-6)


def test_prior_lnltype_samples_prior():
    # lnl_type='prior' ignores the data entirely
    comp, bps, data, amp, inv_rms2 = _setup_pixel_problem(-3.0)
    cfg = specind.SpecIndConfig(grid_min=-6.0, grid_max=0.0, ngrid=512,
                                prior_mean=-2.5, prior_std=0.3,
                                lnl_type="prior")
    beta = specind.sample_specind_pixel(jax.random.PRNGKey(3), comp, bps,
                                        cfg, data, amp, inv_rms2, (-3.0,),
                                        which=0)
    b = np.asarray(beta)
    assert abs(b.mean() + 2.5) < 0.05
    assert abs(b.std() - 0.3) < 0.05


def test_regions_specind_recovers_per_region_truth():
    # two regions with different beta; the region sampler must find both
    npix = 768  # nside 8
    rng = np.random.default_rng(3)
    comp = DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.0,))
    bps = [delta_bandpass(f * GHZ, unit="uK_RJ") for f in (10, 23, 33, 44, 70)]
    region = (np.arange(npix) >= npix // 2).astype(np.int32)
    beta_pix = np.where(region == 0, -3.2, -2.6)
    amp = jnp.asarray(np.abs(rng.standard_normal((1, npix))) * 50 + 30)
    F_true = jnp.stack([mixing_element(comp, bp, (jnp.asarray(beta_pix),))
                        for bp in bps])
    data = F_true[:, None, :] * amp[None] \
        + 0.05 * rng.standard_normal((len(bps), 1, npix))
    inv_rms2 = jnp.full((len(bps), 1, npix), 1.0 / 0.05 ** 2)
    cfg = specind.SpecIndConfig(grid_min=-4.0, grid_max=-2.0, ngrid=256)
    vals, theta_map = specind.sample_specind_regions(
        jax.random.PRNGKey(4), comp, bps, cfg, jnp.asarray(data), amp,
        inv_rms2, (-3.0,), jnp.asarray(region), 2, which=0)
    v = np.asarray(vals)
    assert abs(v[0] + 3.2) < 0.01
    assert abs(v[1] + 2.6) < 0.01
    assert np.allclose(np.asarray(theta_map), v[region])


def test_alm_pixreg_mh_moves_toward_truth_and_respects_fixed():
    from commander_tpu.sphere import sht

    nside, lmax = 8, 16
    npix = 12 * nside * nside
    plan = sht.get_plan(nside, lmax)
    rng = np.random.default_rng(5)
    comp = DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.0,))
    bps = [delta_bandpass(f * GHZ, unit="uK_RJ") for f in (10, 23, 33, 44)]
    region = (np.arange(npix) * 3 // npix).astype(np.int32)  # 3 lat bands
    beta_true = np.asarray([-3.3, -3.0, -2.7])
    beta_pix = beta_true[region]
    amp = jnp.asarray(np.abs(rng.standard_normal((1, npix))) * 50 + 30)
    F_true = jnp.stack([mixing_element(comp, bp, (jnp.asarray(beta_pix),))
                        for bp in bps])
    data = F_true[:, None, :] * amp[None] \
        + 0.5 * rng.standard_normal((len(bps), 1, npix))
    inv_rms2 = jnp.full((len(bps), 1, npix), 1.0 / 0.5 ** 2)
    cfg = specind.SpecIndConfig(grid_min=-4.0, grid_max=-2.0, ngrid=64,
                                prior_mean=-3.0, prior_std=1.0)
    t0 = jnp.asarray([-3.0, -3.0, -3.0])
    fix = np.asarray([False, True, False])
    t = t0
    key = jax.random.PRNGKey(6)
    for s in range(20):
        key, k = jax.random.split(key)
        t, th_map, t_alm, n_acc = specind.sample_specind_alm_pixreg(
            k, comp, bps, cfg, plan, jnp.asarray(data), amp, inv_rms2,
            (-3.0,), t, region, which=0, lmax_ind=2, step=0.03, nsteps=2,
            fix_reg=fix)
    v = np.asarray(t)
    assert v[1] == -3.0                     # frozen region never moves
    assert abs(v[0] + 3.3) < 0.1            # free regions move to truth
    assert abs(v[2] + 2.7) < 0.1
    assert t_alm.shape == (3, 3)
    # theta map is the piecewise-constant region field
    assert np.allclose(np.asarray(th_map), v[region], atol=1e-6)
