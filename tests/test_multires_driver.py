"""Multires driver: heterogeneous band resolutions end to end.

Reference behavior: every band at its own (nside, lmax) inside cr_matmulA
(comm_cr_mod.f90:843-954 with lmax projection :858-860).
"""
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile, unpack_alm_real
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run_multires

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_multires_driver_recovers_amplitudes(tmp_path_factory):
    cfg = lower_params(Params.load(REF_PARAM))
    # well-determined 2-component model (3 bands) so the posterior is
    # data-dominated and the truth-correlation check is meaningful
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]
    # force two resolution groups
    for i, b in enumerate(cfg.bands):
        b.nside = 8 if i % 2 == 0 else 16
        b.lmax = 2 * b.nside
    out = str(tmp_path_factory.mktemp("chains_mr"))
    cfg.cg_tol, cfg.cg_maxiter = 1e-9, 500
    a, chain_path, a_true = run_multires(cfg, niter=3, outdir=out,
                                         synthetic=True, verbose=False)
    assert a is not None and a_true is not None
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 3
        s = ch.read_sample(3)
    # posterior draws correlate strongly with the truth on the
    # data-dominated scales (low ell; higher ells are beam/noise-limited
    # and prior-dominated by construction of the synthetic config)
    a_np = np.asarray(a)
    L = 12
    corr = np.corrcoef(a_np[0, 0, :L, :L].real.ravel(),
                       a_true[0, 0, :L, :L].real.ravel())
    assert corr[0, 1] > 0.9


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_multires_driver_with_tod_band(tmp_path_factory):
    """TOD bands inside the multires loop: a band's TOD pipeline runs at
    its group's native resolution and its mapmaker (map, rms) feed the
    heterogeneous-resolution CG (process_TOD + cr_matmulA per-band
    resolutions, commander.f90:274-399, comm_cr_mod.f90:843-954)."""
    cfg = lower_params(Params.load(REF_PARAM))
    cfg.comps = [c for c in cfg.comps if c.label in ("cmb", "synch")]
    for i, b in enumerate(cfg.bands):
        b.nside = 8 if i % 2 == 0 else 16
        b.lmax = 2 * b.nside
        b.tod_type = "LFI" if i == 0 else "none"
    cfg.enable_tod = True
    out = str(tmp_path_factory.mktemp("chains_mrtod"))
    cfg.cg_tol, cfg.cg_maxiter = 1e-9, 500
    a, chain_path, a_true = run_multires(cfg, niter=2, outdir=out,
                                         synthetic=True, verbose=False,
                                         tod=True)
    assert a is not None
    with ChainFile(chain_path, "r") as ch:
        assert ch.last_sample() == 2
    L = 12
    a_np = np.asarray(a)
    corr = np.corrcoef(a_np[0, 0, :L, :L].real.ravel(),
                       a_true[0, 0, :L, :L].real.ravel())
    assert corr[0, 1] > 0.85
