"""Huffman codec + TOD archive roundtrip tests (native C++ decoder)."""
import numpy as np
import pytest

from commander_tpu.tod import huffman


def test_tree_roundtrip_small():
    rng = np.random.default_rng(0)
    vals = rng.integers(-5, 6, size=1000)
    tree, symb = huffman.build_tree(vals)
    enc = huffman.encode(vals, tree, symb)
    dec = huffman.decode(enc, tree, symb)
    np.testing.assert_array_equal(dec, vals)


def test_native_matches_python():
    rng = np.random.default_rng(1)
    vals = rng.integers(-100, 100, size=5000)
    tree, symb = huffman.build_tree(vals)
    enc = huffman.encode(vals, tree, symb)
    dn = huffman.decode(enc, tree, symb, use_native=True)
    dp = huffman.decode(enc, tree, symb, use_native=False)
    np.testing.assert_array_equal(dn, dp)
    np.testing.assert_array_equal(dn, vals)


def test_native_is_fast():
    import time
    rng = np.random.default_rng(2)
    # pointing-like stream: small diffs with outliers
    vals = np.concatenate([rng.integers(-3, 4, size=400_000),
                           rng.integers(-2000, 2000, size=4000)])
    rng.shuffle(vals)
    tree, symb = huffman.build_tree(vals)
    enc = huffman.encode(vals, tree, symb)
    t0 = time.perf_counter()
    dec = huffman.decode(enc, tree, symb, use_native=True)
    dt = time.perf_counter() - t0
    np.testing.assert_array_equal(dec, vals)
    assert dt < 0.5, f"native decode too slow: {dt:.3f}s for {len(vals)} symbols"


def test_degenerate_single_symbol():
    vals = np.zeros(100, np.int64)
    tree, symb = huffman.build_tree(vals)
    enc = huffman.encode(vals, tree, symb)
    dec = huffman.decode(enc, tree, symb)
    np.testing.assert_array_equal(dec, vals)


def test_archive_roundtrip(tmp_path):
    import jax.numpy as jnp
    from commander_tpu.tod.loader import read_archive, write_archive
    from commander_tpu.tod.sim import simulate_tod

    nside = 8
    rng = np.random.default_rng(3)
    sky = rng.standard_normal((1, 12 * nside * nside)) * 30
    block, truth = simulate_tod(nside, sky, nscan=3, ndet=2, ntod=512, seed=4)
    scans = []
    for s in range(3):
        flags = np.zeros((2, 512), np.int64)
        flags[:, :8] = 1   # match sim's masked edges
        scans.append(dict(
            pix=np.asarray(block.pix[s]),
            psi=np.asarray(block.psi[s]),
            flag=flags,
            tod=np.asarray(block.tod[s]),
            vsun=np.asarray(block.vsun[s]),
        ))
    path = str(tmp_path / "tod_030.h5")
    write_archive(path, nside, block.fsamp, ["27M", "27S"], scans)

    blk2, state2, meta = read_archive(path, bad_flag_bits=1)
    assert meta["nside"] == nside
    np.testing.assert_array_equal(np.asarray(blk2.pix), np.asarray(block.pix))
    np.testing.assert_allclose(np.asarray(blk2.psi), np.asarray(block.psi),
                               atol=2 * np.pi / 4096 + 1e-9)
    np.testing.assert_allclose(np.asarray(blk2.tod), np.asarray(block.tod),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(blk2.mask), np.asarray(block.mask))
