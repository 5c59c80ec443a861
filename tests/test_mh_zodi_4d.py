"""Tests: joint alm-Cl MH, bandpass MH, 4D maps, zodi template."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.sampling import mh
from commander_tpu.model.cl import ClModelConfig


def test_joint_alm_cl_mh_runs_and_targets():
    import sys as _s
    _s.path.insert(0, "tests")
    from test_amplitude import make_system, LMAX
    plan, sys, a_true = make_system(rms_level=10.0)
    cfg = ClModelConfig(kind="binned", lmax=LMAX, nmaps=1,
                        bin_starts=(0, 2, 5, 9, 14))
    cl_bins = jnp.ones((3, 1, 5)) * 100.0
    key = jax.random.PRNGKey(0)
    a = a_true
    n_acc = 0
    for i in range(20):
        key, k = jax.random.split(key)
        a, cl_bins, acc = mh.sample_joint_alm_cl(k, cfg, sys, plan, a,
                                                 cl_bins, comp=0,
                                                 step_size=0.02)
        n_acc += int(acc)
    # with a small step the move should accept a reasonable fraction
    assert 1 <= n_acc <= 20
    assert np.isfinite(np.asarray(cl_bins)).all()


def test_bandpass_mh_prefers_truth():
    import sys as _s
    _s.path.insert(0, "tests")
    from test_amplitude import make_system
    from commander_tpu.instrument.bandpass import tophat_bandpass
    from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
    GHZ = 1e9
    plan, sys, a_true = make_system(rms_level=0.5)
    comps = [
        DiffuseComponent("cmb", "cmb", 100 * GHZ, unit="uK_cmb"),
        DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.1,)),
        DiffuseComponent("dust", "MBB", 353 * GHZ, theta0=(1.6, 19.6)),
    ]
    bps = [tophat_bandpass(f * GHZ, 0.2) for f in (30, 100, 353)]
    thetas = [(), (-3.1,), (1.6, 19.6)]
    # rebuild consistent data with tophat bandpasses at delta = 0
    F0 = np.asarray(mixing_matrix(comps, bps, thetas=thetas))
    sys = dataclasses.replace(
        sys, F=jnp.asarray(F0)[..., None].repeat(1, -1))
    deltas = jnp.zeros(3)
    key = jax.random.PRNGKey(1)
    accs = []
    for i in range(10):
        key, k = jax.random.split(key)
        deltas, F, acc = mh.sample_bandpass_shift(
            k, comps, bps, thetas, sys, plan, a_true, deltas, band=1,
            step_hz=0.3e9, prior_std_hz=2e9)
        accs.append(bool(acc))
    # chain stays near delta = 0 (the truth) within the proposal scale
    assert abs(float(deltas[1])) < 2e9
    assert np.isfinite(float(deltas[1]))


def test_4d_binning():
    from commander_tpu.tod.maps4d import bin_4d
    rng = np.random.default_rng(0)
    Ns, Nd, Nt, npix, npsi = 2, 2, 512, 48, 8
    pix = jnp.asarray(rng.integers(0, npix, (Ns, Nd, Nt)), jnp.int32)
    psi = jnp.asarray(rng.uniform(0, 2 * np.pi, (Ns, Nd, Nt)))
    tod = jnp.asarray(rng.standard_normal((Ns, Nd, Nt))) + 5.0
    mask = jnp.ones((Ns, Nd, Nt))
    inv_var = jnp.ones((Ns, Nd))
    ssum, wsum, mean = bin_4d(tod, pix, psi, mask, inv_var, npix, npsi)
    assert wsum.sum() == Ns * Nd * Nt
    # mean of means ~ 5
    assert abs(float(mean[wsum > 0].mean()) - 5.0) < 0.3


def test_zodi_template_shape_and_positivity():
    from commander_tpu.tod.zodi import KelsallCloud, zodi_template
    cfg = KelsallCloud()
    rng = np.random.default_rng(1)
    v = rng.standard_normal((100, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    earth = jnp.asarray([1.0, 0.0, 0.0])
    s = zodi_template(cfg, 857e9, earth, jnp.asarray(v))
    s = np.asarray(s)
    assert s.shape == (100,)
    assert np.all(s > 0)
    # ecliptic plane brighter than poles
    in_plane = np.abs(v[:, 2]) < 0.2
    poles = np.abs(v[:, 2]) > 0.9
    if in_plane.any() and poles.any():
        assert s[in_plane].mean() > s[poles].mean()


def test_zodi_full_components():
    from commander_tpu.tod.zodi import (BAND1, BAND2, BAND3, KelsallCloud,
                                        KelsallRing, zodi_template)
    cfg = KelsallCloud()
    rng = np.random.default_rng(2)
    v = rng.standard_normal((50, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    earth = jnp.asarray([0.0, 1.0, 0.0])
    s_cloud = np.asarray(zodi_template(cfg, 857e9, earth, jnp.asarray(v)))
    s_full = np.asarray(zodi_template(cfg, 857e9, earth, jnp.asarray(v),
                                      bands=(BAND1, BAND2, BAND3),
                                      ring=KelsallRing()))
    assert np.all(s_full >= s_cloud)        # extra components only add
    assert np.all(np.isfinite(s_full))
    assert s_full.mean() > s_cloud.mean()


def test_powlaw_tilt_bandpass():
    from commander_tpu.instrument.bandpass import tophat_bandpass
    bp = tophat_bandpass(100e9, 0.3)
    nu0, w0 = bp.weights(0.0, shift_model="powlaw_tilt")
    nu1, w1 = bp.weights(2.0, shift_model="powlaw_tilt")
    # positive tilt moves the effective weight to higher frequencies
    eff0 = float(jnp.sum(jnp.asarray(nu0) * w0) / jnp.sum(w0))
    eff1 = float(jnp.sum(jnp.asarray(nu1) * w1) / jnp.sum(w1))
    assert eff1 > eff0
