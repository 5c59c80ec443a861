"""Encoded TOD fast path: the full tutorial shape (3 polarized LFI TOD
bands + 8 components incl. md / radio ptsrc / relquad) through run()
with the device-resident TOD payloads (round-5; run.py _tod_enc).

On CPU the encoded path is forced with fullgibbs="encoded" — the same
code the TPU production run executes (transfer-shim encode/decode,
per-band process_LFI_tod jits, in-jit band map/rms swap, deferred
on-device warm start)."""
import dataclasses
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile
from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run

PARAM = os.path.join(os.path.dirname(__file__), "..",
                     "param_tutorial_full.txt")


@pytest.mark.slow
def test_encoded_tod_pol_full_model_e2e(tmp_path):
    cfg = lower_params(Params.load(PARAM))
    # enough TOD coverage for per-pixel polarized binning at nside 16
    cfg = dataclasses.replace(cfg, synth_tod_nscan=8, synth_tod_ndet=2,
                              synth_tod_ntod=8192)
    out = str(tmp_path)
    state, cp = run(cfg, nside=16, lmax=32, synthetic=True, niter=4,
                    outdir=out, verbose=False, fullgibbs="encoded",
                    dtype="float32", pol=True, tod=True)
    status = open(os.path.join(out, "comm_status.txt")).read()
    assert "encoded" in status          # the encoded TOD path ran
    with ChainFile(cp, "r") as ch:
        assert ch.last_sample() == 4
        s = ch.read_sample(4)
        # polarized alms + the joint rows landed in the chain
        assert s["comps"]["cmb"]["alm"].shape[0] == 3
        assert "md_amps" in s["aux"] and "ptsrc_amps" in s["aux"]
        chi2 = float(s["aux"]["chisq"])
        assert np.isfinite(chi2) and chi2 > 0
        # TOD state sampled on device and written per band
        ts = ch.read_tod_state(4)
        assert sorted(ts) == ["030", "044", "070"]
        for lab in ts:
            assert np.isfinite(ts[lab]["gain"]).all()
            assert (ts[lab]["sigma0"] > 0).all()
