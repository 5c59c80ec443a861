"""Driver-wired TOD physics: sidelobes (BAND_TOD_RIMO -> conviqt), zodi
(TOD_INCLUDE_ZODI), and per-det monopoles (SAMPLE_TOD_MONOPOLE) recovered
through the FULL driver (run()), not a hand-called process_tod — plus TOD
state checkpoint/restore through the chain file.

Reference flow: slconv construction per det per iteration
(comm_tod_LFI_mod.f90:431-446), zodi/sidelobe/mono terms in the per-scan
signal sum (:618-663), tod%dumpToHDF/initHDF chain round trip
(comm_output_mod.f90:91-374)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.io.params import Params, lower_params
from commander_tpu.sphere import healpix, sht
from commander_tpu.sphere.alm import random_alm_white, triangle_mask
from commander_tpu.tod.loader import write_archive
from commander_tpu.instrument.files import write_rimo_tod

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"
NSIDE, LMAX = 8, 16
GAIN_TRUE, SIGMA0 = 1.0, 3.0
MONO_TRUE = np.array([0.8, -0.5])
NDET, NSCAN, NTOD = 2, 6, 2048
DETS = ["27M", "27S"]
SL_LMAX, SL_MMAX = 8, 2


def _make_sky(seed=3):
    nl = LMAX + 1
    plan = sht.get_plan(NSIDE, LMAX)
    ell = np.arange(nl, dtype=float)
    cl = np.zeros(nl)
    cl[2:] = 300.0 / (ell[2:] * (ell[2:] + 1.0))
    a = np.asarray(random_alm_white(jax.random.PRNGKey(seed), (1, nl, nl))
                   * jnp.asarray(triangle_mask(nl, nl))) \
        * np.sqrt(cl)[None, :, None]
    return np.asarray(sht.alm2map(plan, jnp.asarray(a)))  # (1, npix)


def _make_sl_blms(seed=5, amp=0.02):
    """Smooth per-det sidelobe beam alms (nl_sl, mmax+1), normalized to a
    few-percent pickup."""
    rng = np.random.default_rng(seed)
    blms = np.zeros((NDET, SL_LMAX + 1, SL_MMAX + 1), np.complex128)
    for d in range(NDET):
        for m in range(SL_MMAX + 1):
            v = rng.normal(size=SL_LMAX + 1) \
                + (1j * rng.normal(size=SL_LMAX + 1) if m else 0.0)
            v[:m] = 0.0
            blms[d, :, m] = v * np.exp(-0.3 * np.arange(SL_LMAX + 1))
        blms[d] *= amp / np.abs(blms[d]).max()
    return blms


def _forward_physics(sky, pix, psi, satpos, blms, nu=30e9):
    """sidelobe + zodi + mono terms via the tested module forward models."""
    from commander_tpu.tod import zodi as zodi_mod
    from commander_tpu.tod.conviqt import (conviqt_interp, conviqt_precompute,
                                           conviqt_tables)
    plan_sl = sht.get_plan(NSIDE, SL_LMAX)
    tables = conviqt_tables(NSIDE, SL_LMAX, SL_MMAX, "float64")
    alm_sky = np.asarray(sht.map2alm(plan_sl, jnp.asarray(sky)))[0]
    s_sl = np.zeros((NSCAN, NDET, NTOD))
    for d in range(NDET):
        fm = conviqt_precompute(plan_sl, tables, jnp.asarray(alm_sky),
                                jnp.asarray(blms[d]))
        s_sl[:, d] = np.asarray(conviqt_interp(fm, jnp.asarray(pix[:, d]),
                                               jnp.asarray(psi[:, d])))
    s_zodi = np.asarray(zodi_mod.zodi_tod_template(
        NSIDE, jnp.asarray(pix), jnp.asarray(satpos), nu)) \
        * zodi_mod.mjysr_to_uk_cmb(nu)
    return s_sl, s_zodi


def _write_fixture(tmpdir, with_physics=True):
    sky = _make_sky()
    rng = np.random.default_rng(11)
    npix = 12 * NSIDE * NSIDE
    # slow scans covering the sky, distinct per det
    t = np.arange(NTOD)
    pix = np.zeros((NSCAN, NDET, NTOD), np.int64)
    psi = np.zeros((NSCAN, NDET, NTOD))
    for s in range(NSCAN):
        for d in range(NDET):
            start = rng.integers(0, npix)
            pix[s, d] = (start + (t * (d + 3 + s)) // 7) % npix
            psi[s, d] = (0.7 * d + 2 * np.pi * t / 512.0) % (2 * np.pi)
    satpos = np.stack([np.linspace(0.0, 300.0, NSCAN),
                       np.zeros(NSCAN)], axis=-1)
    vsun = np.tile(np.array([0.0, 3.0e4, 0.0]), (NSCAN, 1))
    from commander_tpu.tod.model import orbital_dipole
    pvec = jnp.asarray(healpix.pix2vec_ring(NSIDE))
    s_orb = np.asarray(orbital_dipole(jnp.asarray(vsun), pvec, 30e9,
                                      jnp.asarray(pix)))
    blms = _make_sl_blms()
    s_sky = sky[0][pix]
    s_sl, s_zodi = _forward_physics(sky, pix, psi, satpos, blms)
    if not with_physics:
        s_sl = np.zeros_like(s_sl)
        s_zodi = np.zeros_like(s_zodi)
    mono = MONO_TRUE[None, :, None] if with_physics else 0.0
    tod = GAIN_TRUE * (s_sky + s_orb + s_sl + s_zodi + mono) \
        + SIGMA0 * rng.standard_normal((NSCAN, NDET, NTOD))
    scans = [dict(pix=pix[s], psi=psi[s],
                  flag=np.zeros_like(pix[s]), tod=tod[s], vsun=vsun[s],
                  satpos=satpos[s],
                  scalars=np.tile([1.0, SIGMA0, 0.05, -1.5], (NDET, 1)))
             for s in range(NSCAN)]
    apath = os.path.join(tmpdir, "tod_00.h5")
    write_archive(apath, NSIDE, 30.0, DETS, scans)
    flist = os.path.join(tmpdir, "filelist.txt")
    with open(flist, "w") as fh:
        fh.write(f"{NSCAN}\n" + "\n".join(
            f"{s + 1} tod_00.h5 1.0 1.5 {s * 0.8:.2f}"
            for s in range(NSCAN)) + "\n")
    rimo = os.path.join(tmpdir, "rimo.h5")
    nu_bp = np.linspace(28e9, 32e9, 21)
    write_rimo_tod(rimo, {d: dict(sl=blms[i], fwhm=30.0, centFreq=30.0,
                                  bandpassx=nu_bp / 1e9,
                                  bandpass=np.ones(21))
                          for i, d in enumerate(DETS)})
    return sky, flist, rimo, dict(s_sl=s_sl, s_zodi=s_zodi, pix=pix)


def _driver_cfg(flist, rimo):
    cfg = lower_params(Params.load(REF_PARAM))
    # single band + CMB-only model: the TOD-produced band map IS the sky
    # estimate, so the recovered physics is not confounded by the other
    # bands' independent synthetic realizations
    cfg.comps = [c for c in cfg.comps if c.label == "cmb"]
    cfg.bands = cfg.bands[:1]
    b = cfg.bands[0]
    b.tod_type = "LFI"
    b.tod_filelist = os.path.basename(flist)
    b.tod_rimo = os.path.basename(rimo)
    b.sample_bandpass = True     # exercises the per-det ndelta MH too
    cfg.include_tod_zodi = True
    cfg.sample_tod_mono = True
    return cfg


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_driver_recovers_sl_zodi_mono(tmp_path_factory):
    """With injected sidelobe+zodi+mono, the physics-aware driver's binned
    map must beat a physics-blind driver run on the same archives, and the
    sampled per-det monopoles must move to the truth."""
    from commander_tpu import run as run_mod
    from commander_tpu.io.chain import ChainFile

    data_dir = str(tmp_path_factory.mktemp("tod_phys"))
    sky, flist, rimo, truth = _write_fixture(data_dir, with_physics=True)

    def _run(cfg, out):
        state, chain_path = run_mod.run(cfg, nside=NSIDE, lmax=LMAX,
                                        synthetic=True, niter=3, outdir=out,
                                        verbose=False, tod=True,
                                        data_dir=data_dir)
        with ChainFile(chain_path, "r") as ch:
            s = ch.read_sample(ch.last_sample())
            tods = ch.read_tod_state(ch.last_sample())
        return s, tods, chain_path

    # physics-aware run
    cfg = _driver_cfg(flist, rimo)
    out_a = str(tmp_path_factory.mktemp("chains_phys"))
    s_a, tods_a, chain_a = _run(cfg, out_a)

    # physics-blind run (no RIMO, no zodi, no mono)
    cfg_b = _driver_cfg(flist, rimo)
    cfg_b.include_tod_zodi = False
    cfg_b.sample_tod_mono = False
    for b in cfg_b.bands:
        b.tod_rimo = None
    out_b = str(tmp_path_factory.mktemp("chains_blind"))
    s_b, tods_b, chain_b = _run(cfg_b, out_b)

    band0 = [k for k in tods_a][0]
    mono = tods_a[band0]["mono"]
    assert mono.shape == (NDET,)
    # monopoles recover the zero-sum part of the injected per-det DC
    # (the absolute monopole is degenerate with the sky monopole)
    zt = MONO_TRUE - MONO_TRUE.mean()
    assert np.all(np.abs(mono - zt) < 0.3)
    # chain checkpoints the TOD state incl. per-det bandpass shifts
    for f in ("gain", "sigma0", "alpha", "fknee", "bp_delta",
              "bp_delta_det"):
        assert f in tods_a[band0]
    assert tods_a[band0]["bp_delta_det"].shape == (NDET,)
    # physics-aware chisq must beat the blind run's (the blind run absorbs
    # sidelobe+zodi+mono into noise/sky)
    assert float(s_a["aux"]["chisq"]) < float(s_b["aux"]["chisq"])


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_tod_state_chain_restart(tmp_path_factory):
    """Restart resumes the sampled TOD state from the chain, not the
    archive warm start (tod%initHDF semantics)."""
    from commander_tpu import run as run_mod
    from commander_tpu.io.chain import ChainFile

    data_dir = str(tmp_path_factory.mktemp("tod_restart"))
    sky, flist, rimo, truth = _write_fixture(data_dir, with_physics=True)
    cfg = _driver_cfg(flist, rimo)
    out = str(tmp_path_factory.mktemp("chains_restart"))

    run_mod.run(cfg, nside=NSIDE, lmax=LMAX, synthetic=True, niter=2,
                outdir=out, verbose=False, tod=True, data_dir=data_dir)
    chain_path = os.path.join(out, "chain_c0001.h5")
    with ChainFile(chain_path, "r") as ch:
        tods_before = ch.read_tod_state(1)   # restart resumes from sample 1

    # resume: run() sees last_sample=2, rejects it, restores sample-1 TOD
    # state; after the continuation the chain must extend to sample 3
    run_mod.run(cfg, nside=NSIDE, lmax=LMAX, synthetic=True, niter=3,
                outdir=out, verbose=False, tod=True, data_dir=data_dir)
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3
        tods_after = ch.read_tod_state(3)
    band0 = [k for k in tods_before][0]
    assert tods_before[band0]["gain"].shape == tods_after[band0]["gain"].shape
