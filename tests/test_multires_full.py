"""Full-feature multires: polarization, per-component lmax windows,
indices+gain in the driver loop, 3 native band resolutions — with a
replicated-oracle exactness check.

Reference: the per-band-resolution cr_matmulA loop with lmax projection
(comm_cr_mod.f90:843-954, :858-860)."""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sampling import multires
from commander_tpu.sphere import sht

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


def _pol_system(nside, lmax, nband, ncomp, seed, ell_mask=None):
    nl = lmax + 1
    npix = 12 * nside * nside
    rng = np.random.default_rng(seed)
    F = (1.0 + rng.uniform(0.2, 1.0, (nband, ncomp, 3))).astype(np.float64)
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1)
                * np.radians(rng.uniform(1.0, 3.0, nband))[:, None] ** 2
                )[:, None, :].repeat(3, 1)
    cl = np.zeros((ncomp, 3, nl))
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    if ell_mask is not None:
        cl = cl * ell_mask
    rms = rng.uniform(1.0, 3.0, (nband, 3, npix))
    data = rng.normal(0, 4, (nband, 3, npix))
    return amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))


def test_multires_pol_lmaxwindow_exact_vs_replicated():
    """Two same-resolution groups + pol + per-comp lmax window == the
    single-system Wiener solve."""
    nside, lmax, C = 8, 16, 2
    nl = lmax + 1
    ell_mask = np.ones((C, 3, nl))
    ell_mask[1, :, 9:] = 0.0        # comp 1 confined to l <= 8
    full = _pol_system(nside, lmax, 4, C, seed=0, ell_mask=ell_mask)
    plan = sht.get_plan(nside, lmax, spin2=True)
    a_ref, res_ref = amp.sample_amplitudes(full, plan, key=None, tol=1e-10,
                                           maxiter=200)

    g1 = jax.tree.map(lambda x: x, full)
    take = lambda s, sl: dataclasses.replace(
        s, F=s.F[sl], bl=s.bl[sl], inv_rms2=s.inv_rms2[sl],
        inv_rms=s.inv_rms[sl], data=s.data[sl])
    ms = multires.build_multi_system([take(full, slice(0, 2)),
                                      take(full, slice(2, 4))], full.cl)
    a_mr, res_mr = multires.sample_amplitudes_multi(
        ms, [plan, plan], key=None, tol=1e-10, maxiter=200)
    err = float(jnp.max(jnp.abs(a_mr - a_ref))
                / jnp.maximum(jnp.max(jnp.abs(a_ref)), 1e-30))
    assert err < 1e-6, err
    # the windowed comp is confined in both
    assert float(jnp.abs(a_mr[1, :, 9:, :]).max()) < 1e-12


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_run_multires_full_featured(tmp_path):
    """Tutorial-shaped pol run with 3 native resolutions, free indices,
    gain sampling, and a distinct comp lmax."""
    from commander_tpu.io.chain import ChainFile
    from commander_tpu.io.params import Params, lower_params
    from commander_tpu.run import run_multires

    cfg = lower_params(Params.load(REF_PARAM))
    cfg.comps = [c for c in cfg.comps
                 if c.label in ("cmb", "synch", "dust")]
    for c in cfg.comps:
        c.template_file = None
        c.polarized = True
        if c.label == "synch":
            c.lmax_amp = 10
    cfg.sample_specind = True
    nsides = [8, 16, 32]
    for i, b in enumerate(cfg.bands):
        b.nside = nsides[i % 3]
        b.lmax = 2 * b.nside
        b.polarized = True
        b.sample_gain = True
        b.tod_type = "none"
    out = str(tmp_path / "chains")
    a, chain_path, a_true = run_multires(cfg, niter=3, outdir=out,
                                         synthetic=True, verbose=False,
                                         pol=True)
    assert a.shape[1] == 3                      # IQU
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3
        s = ch.read_sample(3)
    # synch confined to its COMP_LMAX_AMP window
    a_s = s["comps"]["synch"]["alm"]
    assert np.sum(np.abs(a_s[:, 11:, :]) ** 2) \
        < 1e-10 * max(np.sum(np.abs(a_s[:, :11, :]) ** 2), 1e-30)
    # indices moved and were recorded
    assert "specind" in s["aux"]
    # synthetic recovery: the common low-l modes correlate with the truth
    a_c = s["comps"]["cmb"]["alm"]
    nl = a_true.shape[-1]
    w = np.zeros((nl, nl))
    w[2:9, :9] = 1.0
    num = np.abs(np.vdot(a_true[0, 0] * w, a_c[0] * w))
    den = np.sqrt(np.vdot(a_true[0, 0] * w, a_true[0, 0] * w).real
                  * np.vdot(a_c[0] * w, a_c[0] * w).real)
    assert num / max(den, 1e-30) > 0.8
