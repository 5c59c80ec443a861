"""Multi-resolution CG tests: mixed (nside, lmax) bands, shared components."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.instrument.beam import gaussian_bl
from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
from commander_tpu.sampling import amplitude as amp, multires
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white, triangle_mask

GHZ = 1e9
LMAX = 16  # component lmax


def make_multi(rms_level=5.0, seed=0):
    comps = [
        DiffuseComponent("cmb", "cmb", 100 * GHZ, unit="uK_cmb"),
        DiffuseComponent("dust", "MBB", 353 * GHZ, theta0=(1.6, 19.6)),
    ]
    nl = LMAX + 1
    ell = np.arange(nl)
    cl = (5e3 / (1 + ell * (ell + 1.0)))[None, None, :].repeat(2, 0)

    # group 0: two bands at nside 8, band lmax 16; group 1: one band at
    # nside 16, band lmax 12 (lower band-limit than the components)
    groups = []
    plans = []
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    tri = jnp.asarray(triangle_mask(nl, nl))
    a_true = amp.apply_sqrtS(jnp.asarray(cl),
                             random_alm_white(key, (2, 1, nl, nl))) * tri
    for (nside, lmax_g, freqs, fwhms) in [
        (8, 16, (100, 353), (600.0, 420.0)),
        (16, 12, (217,), (500.0,)),
    ]:
        plan = sht.get_plan(nside, lmax_g)
        bps = [delta_bandpass(f * GHZ) for f in freqs]
        F = np.asarray(mixing_matrix(comps, bps))
        bl = np.stack([gaussian_bl(f, lmax_g) for f in fwhms])[:, None, :]
        npix = 12 * nside * nside
        rms = np.full((len(freqs), 1, npix), rms_level)
        sys_g = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                                 jnp.asarray(rms),
                                 jnp.asarray(cl[:, :, :lmax_g + 1]),
                                 jnp.zeros((len(freqs), 1, npix)))
        a_g = a_true[..., :lmax_g + 1, :lmax_g + 1]
        sky = amp._synth(plan, amp._project_bands(sys_g, plan, a_g))
        data = np.asarray(sky) + rms * rng.standard_normal(sky.shape)
        import dataclasses
        sys_g = dataclasses.replace(sys_g, data=jnp.asarray(data))
        groups.append(sys_g)
        plans.append(plan)
    ms = multires.build_multi_system(groups, cl)
    return ms, tuple(plans), a_true


def test_multi_self_adjoint():
    ms, plans, _ = make_multi()
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(jax.random.PRNGKey(1), (2, 1, nl, nl)) * tri
    v = random_alm_white(jax.random.PRNGKey(2), (2, 1, nl, nl)) * tri
    lhs = alm_dot(u, multires.apply_A_multi(ms, plans, v))
    rhs = alm_dot(multires.apply_A_multi(ms, plans, u), v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)


def test_multi_wiener_solve_converges():
    ms, plans, a_true = make_multi(rms_level=0.05)
    a, res = multires.sample_amplitudes_multi(ms, plans, key=None, tol=1e-10,
                                              maxiter=800)
    assert res.converged
    # modes seen by the high-res group (ell <= 16) recovered; dust and cmb
    # separated thanks to the two-frequency group
    nl = LMAX + 1
    tri = triangle_mask(nl, nl).astype(bool)
    err = np.abs(np.asarray(a - a_true))[:, 0][:, tri]
    scale = np.abs(np.asarray(a_true)).max()
    assert err.max() < 5e-3 * scale


def test_multi_sampling_jit():
    ms, plans, _ = make_multi(rms_level=10.0)
    f = jax.jit(lambda k: multires.sample_amplitudes_multi(
        ms, plans, key=k, tol=1e-7, maxiter=200)[0])
    a = f(jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(a.real)).all()
