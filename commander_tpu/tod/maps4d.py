"""4D maps: (pixel, psi-bin) binned TOD products for null tests.

TPU-native counterpart of ``comm_4D_map_mod.f90`` (:97 HDF output) and its
hash-table binning (hashtbl_4Dmap.f90): one segment_sum over the combined
(pix * npsi + psi_bin) index replaces the hash machinery.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bin_4d(tod, pix, psi, mask, inv_var, npix: int, npsi: int):
    """Returns (signal_sum (npix, npsi), weight_sum (npix, npsi), mean)."""
    psi_bin = (jnp.floor(psi / (2.0 * jnp.pi) * npsi).astype(jnp.int32)
               % npsi)
    key = (pix.astype(jnp.int32) * npsi + psi_bin).reshape(-1)
    w = (mask * inv_var[..., None]).reshape(-1)
    d = (tod).reshape(-1) * w
    ssum = jax.ops.segment_sum(d, key, num_segments=npix * npsi)
    wsum = jax.ops.segment_sum(w, key, num_segments=npix * npsi)
    mean = jnp.where(wsum > 0, ssum / jnp.maximum(wsum, 1e-30), 0.0)
    return (ssum.reshape(npix, npsi), wsum.reshape(npix, npsi),
            mean.reshape(npix, npsi))


def write_4d_hdf(path: str, det: str, ssum, wsum, mean):
    """HDF output mirroring the reference's 4D-map files."""
    import h5py

    with h5py.File(path, "a") as f:
        g = f.require_group(det)
        for name, arr in [("signal", ssum), ("weight", wsum), ("mean", mean)]:
            if name in g:
                del g[name]
            g.create_dataset(name, data=np.asarray(arr))
