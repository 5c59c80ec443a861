"""alm-layout utilities: metric inner products, white draws, masks.

The rectangular complex layout a[..., l, m] (m >= 0) carries the real-field
inner product <a,b> = sum_l [a_l0 b_l0 + 2 sum_{m>0} Re(a conj(b))] — the
same metric as the reference's real-packed solution vector (cr_amp2x /
mpi_dot_product, comm_cr_utils.f90 / comm_utils.f90:599).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def eps_weights(nm: int, dtype=jnp.float64) -> jnp.ndarray:
    """(nm,): 1 for m=0, 2 for m>0."""
    return jnp.concatenate([jnp.ones((1,), dtype), 2.0 * jnp.ones((nm - 1,), dtype)])


def triangle_mask(nl: int, nm: int, lmin: int = 0) -> np.ndarray:
    ll = np.arange(nl)[:, None]
    mm = np.arange(nm)[None, :]
    return ((mm <= ll) & (ll >= lmin)).astype(np.float64)


def alm_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Epsilon-weighted real inner product over ALL axes."""
    eps = eps_weights(a.shape[-1], jnp.real(a).dtype)
    return jnp.sum(eps * jnp.real(a * jnp.conj(b)))


def random_alm_white(key, shape, dtype=jnp.float64) -> jnp.ndarray:
    """Unit Gaussian alm under the eps metric: density exp(-||a||^2_eps / 2).

    m=0: real N(0,1); m>0: re,im ~ N(0, 1/2). shape ends with (nl, nm);
    the caller applies triangle masks.
    """
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, shape, dtype)
    im = jax.random.normal(ki, shape, dtype)
    nm = shape[-1]
    sig = jnp.concatenate([jnp.ones((1,), dtype),
                           jnp.full((nm - 1,), 1.0 / np.sqrt(2.0), dtype)])
    re = re * sig
    im = im * sig
    im = im.at[..., 0].set(0.0)
    return re + 1j * im


def almxfl(alm: jnp.ndarray, fl: jnp.ndarray) -> jnp.ndarray:
    """Multiply alm[..., l, m] by per-ell function fl[..., l]."""
    return alm * fl[..., :, None]


def real_m0(alm: jnp.ndarray) -> jnp.ndarray:
    """Project m=0 coefficients onto the real axis.

    Real fields carry exactly ONE real dof at m=0; the complex layout has a
    spurious imaginary slot there (under spin-2 synthesis Im E_l0 aliases
    B_l0). Samplers and CG operators must stay in this subspace — the
    analog of the reference's real-packed solution vector (cr_amp2x)."""
    return alm.at[..., 0].set(alm[..., 0].real.astype(alm.dtype))
