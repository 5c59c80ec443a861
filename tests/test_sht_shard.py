"""m-sharded multi-device SHT (P2) vs the single-device transform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from commander_tpu.parallel.sht_shard import (rings_to_map,
                                              sharded_alm2map_rings)
from commander_tpu.sphere import sht

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def test_sharded_synthesis_matches_local():
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax)
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(0)
    nl = lmax + 1
    alm = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    alm[:, :, 0] = alm[:, :, 0].real

    ref = np.asarray(sht.alm2map(plan, jnp.asarray(alm)))
    with mesh:
        fr = sharded_alm2map_rings(plan, jnp.asarray(alm), mesh)
        m = np.asarray(rings_to_map(plan, fr))
    assert np.abs(m - ref).max() < 1e-10 * max(np.abs(ref).max(), 1.0)


def test_sharded_adjoint_matches_local():
    from commander_tpu.parallel.sht_shard import (map_to_rings,
                                                  sharded_alm2map_adjoint_rings)
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax)
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(1)
    maps = rng.standard_normal((2, 12 * nside * nside))
    ref = np.asarray(sht.alm2map_adjoint(plan, jnp.asarray(maps)))
    with mesh:
        fr = map_to_rings(plan, jnp.asarray(maps), ndev)
        a = np.asarray(sharded_alm2map_adjoint_rings(plan, fr, mesh))
    nm = lmax + 1
    assert np.abs(a[..., :nm] - ref).max() < 1e-10 * np.abs(ref).max()


def test_sharded_spin2_synthesis_matches_local():
    from commander_tpu.parallel.sht_shard import sharded_alm2map_spin2_rings
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax, spin2=True)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(2)
    nl = lmax + 1
    aE = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    aB = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    for a in (aE, aB):
        for l in range(nl):
            a[:, l, l + 1:] = 0
        a[:, :, 0] = a[:, :, 0].real
        a[:, :2] = 0
    Qr, Ur = sht.alm2map_spin2(plan, jnp.asarray(aE), jnp.asarray(aB))
    with mesh:
        P = sharded_alm2map_spin2_rings(plan, jnp.asarray(aE),
                                        jnp.asarray(aB), mesh)
        Q = np.asarray(rings_to_map(plan, P.real))
        U = np.asarray(rings_to_map(plan, P.imag))
    scale = max(np.abs(np.asarray(Qr)).max(), 1.0)
    assert np.abs(Q - np.asarray(Qr)).max() < 1e-10 * scale
    assert np.abs(U - np.asarray(Ur)).max() < 1e-10 * scale


def test_sharded_spin2_adjoint_matches_local():
    from commander_tpu.parallel.sht_shard import (map_to_rings,
                                                  sharded_spin2_adjoint_rings)
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax, spin2=True)
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(3)
    Q = rng.standard_normal((2, 12 * nside * nside))
    U = rng.standard_normal((2, 12 * nside * nside))
    Er, Br = sht.alm2map_spin2_adjoint(plan, jnp.asarray(Q), jnp.asarray(U))
    with mesh:
        fr = map_to_rings(plan, jnp.asarray(Q + 1j * U), ndev)
        E, B = sharded_spin2_adjoint_rings(plan, fr, mesh)
        E, B = np.asarray(E), np.asarray(B)
    nm = lmax + 1
    scale = np.abs(np.asarray(Er)).max()
    assert np.abs(E[..., :nm] - np.asarray(Er)).max() < 1e-10 * scale
    assert np.abs(B[..., :nm] - np.asarray(Br)).max() < 1e-10 * scale


def test_sharded_otf_synthesis_matches_local():
    from commander_tpu.parallel.sht_shard import sharded_alm2map_otf_rings
    from commander_tpu.sphere.sht_otf import legendre_otf
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax)
    otf = legendre_otf(nside, lmax, 0, dtype="float64")
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(4)
    nl = lmax + 1
    alm = rng.standard_normal((2, nl, nl)) + 1j * rng.standard_normal((2, nl, nl))
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    alm[:, :, 0] = alm[:, :, 0].real
    ref = np.asarray(sht.alm2map(plan, jnp.asarray(alm)))
    with mesh:
        fr = sharded_alm2map_otf_rings(plan, otf, jnp.asarray(alm), mesh)
        m = np.asarray(rings_to_map(plan, fr))
    assert np.abs(m - ref).max() < 1e-9 * max(np.abs(ref).max(), 1.0)


def test_sharded_otf_adjoint_matches_local():
    from commander_tpu.parallel.sht_shard import (map_to_rings,
                                                  sharded_adjoint_otf_rings)
    from commander_tpu.sphere.sht_otf import legendre_otf
    nside, lmax = 16, 32
    plan = sht.get_plan(nside, lmax)
    otf = legendre_otf(nside, lmax, 0, dtype="float64")
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(5)
    maps = rng.standard_normal((2, 12 * nside * nside))
    ref = np.asarray(sht.alm2map_adjoint(plan, jnp.asarray(maps)))
    with mesh:
        fr = map_to_rings(plan, jnp.asarray(maps), ndev)
        a = np.asarray(sharded_adjoint_otf_rings(plan, otf, fr, mesh))
    nm = lmax + 1
    assert np.abs(a[..., :nm] - ref).max() < 1e-9 * np.abs(ref).max()
