"""Larger-scale driver smoke (round-3 VERDICT weak #6): the nside-8/16
e2e tests cannot catch scale-dependent bugs (the round-3 TPU miscompile
was one); this slow-marked test runs the production fast path at
nside 128 / lmax 256 with 3 bands and sampled indices and checks
convergence + recovery-quality invariants.
"""
import numpy as np
import pytest

from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run


@pytest.mark.slow
def test_driver_nside128_fullgibbs(tmp_path):
    lines = [
        "OPERATION = sample", "NUM_GIBBS_ITER = 4", "NUMBAND = 3",
        "NUM_SIGNAL_COMPONENTS = 2",
        "OUTPUT_DIRECTORY = " + str(tmp_path / "chains"),
        "SAMPLE_SIGNAL_AMPLITUDES = .true.",
        "SAMPLE_SPECTRAL_INDICES = .true.",
        "SAMPLE_POWSPEC = .true.", "CG_MAXITER = 60",
        "CG_TOLERANCE = 1e-8", "BASE_SEED = 2",
    ]
    for i, f in ((1, 30.0), (2, 70.0), (3, 143.0)):
        lines += [
            f"INCLUDE_BAND{i:03d} = .true.",
            f"BAND_LABEL{i:03d} = b{i}", f"BAND_NSIDE{i:03d} = 128",
            f"BAND_LMAX{i:03d} = 256", f"BAND_UNIT{i:03d} = uK_cmb",
            f"BAND_POLARIZATION{i:03d} = .false.",
            f"BAND_NOMINAL_FREQ{i:03d} = {f}",
            f"BAND_BANDPASS_TYPE{i:03d} = delta",
        ]
    lines += [
        "COMP_LABEL01 = cmb", "COMP_TYPE01 = cmb",
        "COMP_CLASS01 = diffuse", "COMP_POLARIZATION01 = .false.",
        "COMP_NSIDE01 = 128", "COMP_LMAX_AMP01 = 256",
        "COMP_LMAX_IND01 = -1", "COMP_UNIT01 = uK_cmb",
        "COMP_NU_REF_T01 = 100", "COMP_CL_TYPE01 = binned",
        "COMP_LABEL02 = synch", "COMP_TYPE02 = power_law",
        "COMP_CLASS02 = diffuse", "COMP_POLARIZATION02 = .false.",
        "COMP_NSIDE02 = 128", "COMP_LMAX_AMP02 = 256",
        "COMP_LMAX_IND02 = -1", "COMP_UNIT02 = uK_RJ",
        "COMP_NU_REF_T02 = 30", "COMP_CL_TYPE02 = binned",
        "COMP_DEFAULT_BETA02 = -3.0",
        "COMP_PRIOR_UNI_BETA_LOW02 = -3.6",
        "COMP_PRIOR_UNI_BETA_HIGH02 = -2.4",
        "COMP_PRIOR_GAUSS_BETA_MEAN02 = -3.0",
        "COMP_PRIOR_GAUSS_BETA_RMS02 = 0.2",
    ]
    pf = tmp_path / "param128.txt"
    pf.write_text("\n".join(lines) + "\n")
    cfg = lower_params(Params.load(str(pf)))
    state, chain_path = run(cfg, synthetic=True, niter=4, verbose=False,
                            dtype="float32")
    from commander_tpu.io.chain import ChainFile
    with ChainFile(chain_path, "r") as ch:
        s = ch.read_sample(4)
    a = np.asarray(s["comps"]["cmb"]["alm"])
    assert np.isfinite(a).all()
    # CG must actually converge at this scale
    assert float(np.asarray(state.cg_relres)) < 1e-6
    beta = float(np.asarray(s["comps"]["synch"]["specind"])[0])
    assert -3.6 < beta < -2.4
    # Dl stays physical (positive, finite) over the full ell range
    dl = np.asarray(s["comps"]["cmb"]["Dl"])
    assert np.isfinite(dl).all() and (dl[..., 2:] >= 0).all()
