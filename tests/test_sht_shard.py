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
