"""Float-only host<->device transfer encoding.

Some restricted TPU runtimes (this container's axon tunnel) implement
host<->device transfers ONLY for float32/float64 buffers: device_put of
complex64, int32 or bfloat16 arrays raises UNIMPLEMENTED even though the
same dtypes compute fine on device once materialized by a compiled
program.  This module encodes an arbitrary pytree into float-only leaves
on the host and decodes it back to the original dtypes *inside* jit, so
any jitted function can run on such a runtime:

    spec, enc = encode(tree)            # host: float32/float64 leaves only
    enc = jax.device_put(enc, device)
    @jax.jit
    def f(enc):
        tree = decode(spec, enc)        # on-device dtype reconstruction
        ...
        return result_as_float

Encoding: complex -> stacked (re, im) float pair; integer -> float64
(exact for |v| < 2^53, which covers every index array here); bfloat16 ->
float32; bool -> float32.  float32/float64 pass through.  `spec` is
hashable static metadata (treedef + per-leaf kind/dtype), safe to close
over or pass as a static jit argument.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu


class TransferSpec(NamedTuple):
    treedef: Any
    kinds: tuple          # per-leaf: ("c"|"i"|"b"|"o"|"f", dtype-str)


def encode(tree) -> tuple[TransferSpec, list]:
    """Flatten `tree` into float-only arrays + static reconstruction spec."""
    leaves, treedef = jtu.tree_flatten(tree)
    enc, kinds = [], []
    for x in leaves:
        a = np.asarray(x)
        dt = a.dtype
        if np.issubdtype(dt, np.complexfloating):
            wide = np.float64 if dt == np.complex128 else np.float32
            enc.append(np.stack([a.real, a.imag]).astype(wide))
            kinds.append(("c", str(dt)))
        elif np.issubdtype(dt, np.integer):
            enc.append(a.astype(np.float64))
            kinds.append(("i", str(dt)))
        elif dt == np.bool_:
            enc.append(a.astype(np.float32))
            kinds.append(("o", "bool"))
        elif str(dt) == "bfloat16":
            enc.append(a.astype(np.float32))
            kinds.append(("b", "bfloat16"))
        else:
            enc.append(a)
            kinds.append(("f", str(dt)))
    return TransferSpec(treedef, tuple(kinds)), enc


def decode(spec: TransferSpec, enc):
    """Rebuild the original pytree from encoded leaves (jit-safe)."""
    out = []
    for (kind, dt), x in zip(spec.kinds, enc):
        if kind == "c":
            out.append((x[0] + 1j * x[1]).astype(dt))
        elif kind in ("i", "b"):
            out.append(x.astype(dt))
        elif kind == "o":
            out.append(x.astype(bool))
        else:
            out.append(x)
    return jtu.tree_unflatten(spec.treedef, out)


def encode_like(spec: TransferSpec, tree):
    """In-jit inverse of decode: re-encode `tree` (matching `spec`) into
    float-only leaves, so jitted step functions can RETURN updated state
    in transferable form and carry it across jit calls device-side.

    This is the chunked-iteration carry pattern that works around the
    XLA/TPU long-fori_loop miscompile (BASELINE.md round-3): keep each
    jit's loop short and thread the state through encoded leaves."""
    leaves = jtu.tree_leaves(tree)
    out = []
    for (kind, dt), x in zip(spec.kinds, leaves):
        if kind == "c":
            wide = jnp.float64 if dt == "complex128" else jnp.float32
            out.append(jnp.stack([jnp.real(x), jnp.imag(x)]).astype(wide))
        elif kind == "i":
            out.append(x.astype(jnp.float64))
        elif kind in ("o", "b"):
            out.append(x.astype(jnp.float32))
        else:
            out.append(x)
    return out


def device_put_encoded(tree, device) -> tuple[TransferSpec, list]:
    """encode + device_put in one step."""
    spec, enc = encode(tree)
    return spec, jax.device_put(enc, device)


def jit_encoded(fn, *trees, device=None, static_argnums=(), donate=False):
    """Jit `fn(*trees, *extra)` with float-only transfers for `trees`.

    Returns (wrapped, encoded_args): call wrapped(*encoded_args, *extra).
    Extra positional arguments pass through unencoded (must themselves be
    transferable, e.g. float arrays or python ints via static_argnums).
    """
    specs, encs = [], []
    for t in trees:
        spec, enc = encode(t)
        if device is not None:
            enc = jax.device_put(enc, device)
        specs.append(spec)
        encs.append(enc)
    n = len(trees)
    shifted = tuple(n + i if isinstance(i, int) else i
                    for i in static_argnums)

    def wrapper(*args):
        decoded = [decode(s, e) for s, e in zip(specs, args[:n])]
        return fn(*decoded, *args[n:])

    return jax.jit(wrapper, static_argnums=shifted,
                   donate_argnums=() if not donate else tuple(range(n))), encs
