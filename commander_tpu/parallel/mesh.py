"""Device-mesh and sharding helpers.

TPU-native replacement for the reference's MPI communicator topology
(``initialize_mpi_struct``, comm_param_mod.f90:288-359): instead of
WORLD -> per-chain -> node-shared communicators, we define a logical mesh
with axes
    chain  — independent Gibbs chains (P1, embarrassing parallel)
    band   — frequency bands inside the CG operator (P3; psum over partial
             A^T N^-1 A contributions rides ICI)
(with the m-shard SHT axis P2 to come for nside >= 1024 single transforms).
All collectives are XLA-inserted via sharding annotations — no hand-written
NCCL/MPI calls.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_chain: int = 1, n_band: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_chain * n_band
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_chain, n_band)
    return Mesh(dev, axis_names=("chain", "band"))


def band_sharding(mesh: Mesh):
    """Sharding placing the leading band axis across the 'band' mesh axis."""
    return NamedSharding(mesh, P(None, "band"))


def shard_system_over_bands(mesh: Mesh, sys):
    """Place an AmplitudeSystem's per-band arrays across the band axis and
    replicate everything else. Works for chain-batched systems too (leading
    chain axis handled by vmap outside)."""
    import dataclasses as dc
    bandspec = NamedSharding(mesh, P("band"))
    repl = NamedSharding(mesh, P())
    def put(name, x):
        if x is None:
            return None
        if name in ("F", "bl", "inv_rms2", "inv_rms", "data"):
            return jax.device_put(x, bandspec)
        return jax.device_put(x, repl)
    return dc.replace(sys, **{f.name: put(f.name, getattr(sys, f.name))
                              for f in dc.fields(sys)})
