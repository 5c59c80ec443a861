"""Driver e2e guard for the tutorial-scale MODEL (5 components incl.
freefree T_e and spindust nu_p) through the fullgibbs fast path.

This exact component set exposed the f32 constant-fold underflow NaN
(see test_sed_map_finite.py): the 2/3-component smokes never evaluate
freefree/spindust mixing inside the index-grid lax.map. Runs the real
CLI config at nside 32 so the whole path (param parse -> synthetic
data -> fullgibbs jit -> chain output) is exercised.
"""
import numpy as np
import pytest

from commander_tpu.io.params import Params, lower_params
from commander_tpu.run import run


@pytest.mark.slow
def test_tutorial_scale_5comp_fullgibbs(tmp_path):
    cfg = lower_params(Params.load("param_tutorial_scale.txt"))
    run(cfg, nside=32, lmax=64, synthetic=True, niter=2,
        outdir=str(tmp_path / "chains"), dtype="float32")
    import h5py
    files = sorted((tmp_path / "chains").glob("chain_c*.h5"))
    assert files, "chain output missing"
    with h5py.File(files[0], "r") as f:
        samp = f["000002"]
        for name in ("cmb", "synch", "dust", "ff", "ame"):
            a = np.asarray(samp[name]["alm"])
            assert np.isfinite(a).all(), name
