"""Parameter-file parser and HDF5 chain I/O tests."""
import os

import numpy as np
import pytest

from commander_tpu.io.chain import ChainFile, pack_alm_real, unpack_alm_real
from commander_tpu.io.params import Params, lower_params, parse_value

REF_PARAM = "/root/reference/tutorial/param_tutorial.txt"


def test_parse_value_fortran_literals():
    assert parse_value(".true.") is True
    assert parse_value(".false.") is False
    assert parse_value("1.d-8") == 1e-8
    assert parse_value("163425") == 163425
    assert parse_value("none") is None
    assert parse_value("uK_cmb") == "uK_cmb"


def test_paramfile_roundtrip(tmp_path):
    f = tmp_path / "p.txt"
    f.write_text(
        "KEY_A = 3        # comment\n"
        "KEY_B = 'quoted value'  trailing\n"
        "NUMBAND = 2\n"
        "INCLUDE_BAND001 = .true.\n"
        "BAND_LABEL001 = x  # c\n"
        "BAND_NSIDE001 = 16\nBAND_LMAX001 = 32\n"
        "BAND_NOMINAL_FREQ001 = 30.\n"
        "INCLUDE_BAND002 = .false.\n"
    )
    p = Params.load(str(f))
    assert p.get("KEY_A") == 3
    assert p.get("KEY_B") == "quoted value"
    cfg = lower_params(p)
    assert len(cfg.bands) == 1
    assert cfg.bands[0].nside == 16


def test_include_directive(tmp_path):
    (tmp_path / "inc.txt").write_text("FROM_INC = 42\n")
    f = tmp_path / "main.txt"
    f.write_text("@INCLUDE inc.txt\nMAIN_KEY = 1\n")
    p = Params.load(str(f))
    assert p.get("FROM_INC") == 42
    assert p.get("MAIN_KEY") == 1


@pytest.mark.skipif(not os.path.exists(REF_PARAM), reason="reference absent")
def test_lower_reference_tutorial():
    cfg = lower_params(Params.load(REF_PARAM))
    assert cfg.num_gibbs_iter == 1000
    assert cfg.cg_maxiter == 300
    assert [b.label for b in cfg.bands] == ["030", "044", "070"]
    labels = [c.label for c in cfg.comps]
    for expected in ("cmb", "synch", "dust", "md", "radio", "ff", "ame",
                     "relquad"):
        assert expected in labels, labels
    dust = next(c for c in cfg.comps if c.label == "dust")
    assert dust.ctype == "MBB"
    assert dust.indices["beta"]["default"] == pytest.approx(1.56)
    assert dust.nu_ref_t_ghz == pytest.approx(545.0)


def test_alm_packing_roundtrip():
    rng = np.random.default_rng(0)
    lmax = 8
    alm = rng.standard_normal((2, lmax + 1, lmax + 1)) \
        + 1j * rng.standard_normal((2, lmax + 1, lmax + 1))
    for l in range(lmax + 1):
        alm[:, l, l + 1:] = 0
    alm[:, :, 0] = alm[:, :, 0].real
    packed = pack_alm_real(alm, lmax)
    assert packed.shape == (2, (lmax + 1) ** 2)
    rec = unpack_alm_real(packed, lmax)
    np.testing.assert_allclose(rec, alm, atol=1e-14)


def test_chain_write_read_resume(tmp_path):
    path = str(tmp_path / "chain_c0001.h5")
    rng = np.random.default_rng(1)
    lmax = 4
    alm = rng.standard_normal((1, lmax + 1, lmax + 1)) + 0j
    for l in range(lmax + 1):
        alm[:, l, l + 1:] = 0
    with ChainFile(path) as ch:
        assert ch.last_sample() == 0
        ch.write_metadata({"nside": 8, "lmax": lmax})
        for i in (1, 2, 3):
            ch.write_sample(i, {"cmb": {"alm": alm * i,
                                        "Dl": np.ones((1, lmax + 1)) * i}},
                            gains=np.array([1.0, 1.01]),
                            extra={"chisq": np.float64(42.0 + i)})
    with ChainFile(path, "r") as ch:
        assert ch.last_sample() == 3
        s = ch.read_sample(2)
        np.testing.assert_allclose(s["comps"]["cmb"]["alm"], alm * 2, atol=1e-13)
        np.testing.assert_allclose(s["comps"]["cmb"]["Dl"], 2.0)
        np.testing.assert_allclose(s["gain"], [1.0, 1.01])
        assert s["aux"]["chisq"] == 44.0
        assert ch.read_metadata()["nside"] == 8
