"""Float-only transfer encoding (utils/transfer.py): exact round-trips
and jit execution from encoded leaves — the shim that lets the framework
run on TPU runtimes whose host<->device transfers only implement f32/f64
(this container's axon tunnel)."""
import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.sphere import sht
from commander_tpu.utils import transfer


def test_encode_decode_roundtrip_dtypes():
    tree = {
        "c64": np.arange(6, dtype=np.complex64).reshape(2, 3) * (1 + 2j),
        "c128": np.arange(4, dtype=np.complex128) * (3 - 1j),
        "i32": np.arange(10, dtype=np.int32),
        "i64": np.asarray([2**40, -7], dtype=np.int64),
        "f32": np.linspace(0, 1, 5, dtype=np.float32),
        "f64": np.linspace(0, 1, 5, dtype=np.float64),
        "bool": np.asarray([True, False, True]),
        "nested": (np.float32(2.5), [np.int32(7)]),
    }
    spec, enc = transfer.encode(tree)
    for leaf in enc:
        assert np.asarray(leaf).dtype in (np.float32, np.float64), leaf.dtype
    out = jax.tree.map(np.asarray, transfer.decode(spec, enc))
    for k in tree:
        got = out[k] if not isinstance(tree[k], tuple) else None
    np.testing.assert_array_equal(out["c64"], tree["c64"])
    assert out["c64"].dtype == np.complex64
    np.testing.assert_array_equal(out["c128"], tree["c128"])
    np.testing.assert_array_equal(out["i32"], tree["i32"])
    assert out["i32"].dtype == np.int32
    np.testing.assert_array_equal(out["i64"], tree["i64"])
    np.testing.assert_array_equal(out["f32"], tree["f32"])
    np.testing.assert_array_equal(out["bool"], tree["bool"])
    assert out["bool"].dtype == bool
    assert float(out["nested"][0]) == 2.5
    assert int(out["nested"][1][0]) == 7


def test_decode_inside_jit_sht_plan():
    # the real use: ship an SHT plan (complex Bluestein tables + int index
    # arrays) through float-only transfers and run a transform from it
    nside, lmax = 8, 16
    plan = sht.get_plan(nside, lmax, dtype="float64")
    rng = np.random.default_rng(0)
    nl = lmax + 1
    a = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    a = jnp.asarray(a)

    spec_p, enc_p = transfer.encode(plan)
    spec_a, enc_a = transfer.encode(a)

    @jax.jit
    def f(ep, ea):
        p = transfer.decode(spec_p, ep)
        x = transfer.decode(spec_a, ea)
        return sht.alm2map(p, x)

    m = f(enc_p, enc_a)
    m_ref = sht.alm2map(plan, a)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-12, atol=1e-12)


def test_jit_encoded_wrapper():
    plan = sht.get_plan(4, 8, dtype="float64")
    a = jnp.asarray(np.random.default_rng(1).standard_normal((1, 9, 9))
                    + 0j)
    fn, encs = transfer.jit_encoded(
        lambda p, x: jnp.sum(sht.alm2map(p, x) ** 2), plan, a)
    v = float(fn(*encs))
    ref = float(jnp.sum(sht.alm2map(plan, a) ** 2))
    assert abs(v - ref) < 1e-10 * max(1.0, abs(ref))
