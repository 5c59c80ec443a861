"""Safe device->host transfer on restricted TPU runtimes.

The axon PJRT backend in this environment only implements device->host
copies for buffers whose physical layout is linear (row-major, untiled) and
real-typed; a jit output holding a tiled layout fails with UNIMPLEMENTED —
and one failed transfer poisons the whole session. `fetch` relayouts any
array through a tiny jitted identity with an explicit linear-layout
out_shardings, splits complex into (real, imag), and only then converts to
numpy. On CPU (and well-behaved TPU runtimes) it's a plain device_get.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _relayout_fn(ndim: int, device):
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(Layout(major_to_minor=tuple(range(ndim)), tiling=()),
                 SingleDeviceSharding(device))
    return jax.jit(lambda x: x + 0, out_shardings=fmt)


def fetch(x) -> np.ndarray:
    """Device array -> numpy, safe on layout-restricted TPU backends."""
    x = jnp.asarray(x)
    dev = next(iter(x.devices()))
    if dev.platform == "cpu":
        return np.asarray(x)
    if jnp.iscomplexobj(x):
        re = fetch(x.real)
        im = fetch(x.imag)
        return re + 1j * im
    relayout = _relayout_fn(x.ndim, dev)
    return np.asarray(jax.block_until_ready(relayout(x)))


def fetch_tree(tree):
    """fetch() over a pytree."""
    return jax.tree.map(fetch, tree)
