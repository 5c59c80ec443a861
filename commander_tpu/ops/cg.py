"""Generic preconditioned conjugate-gradient solver as a jitted while_loop.

TPU-native counterpart of the reference's distributed CG
(``solve_cr_eqn_by_CG``, comm_cr_mod.f90:48-406): the Fortran iteration with
MPI dot products becomes a ``lax.while_loop`` over pytree state whose inner
products are jnp reductions (psum-able under shard_map for multi-chip runs).
Convergence on relative residual or fixed iteration count, like the
reference's convergence modes (:219-247).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: object          # solution pytree
    iters: jnp.ndarray
    rel_res: jnp.ndarray   # final |r|/|b|
    converged: jnp.ndarray


def tree_dot(a, b) -> jnp.ndarray:
    leaves = jax.tree.map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree.reduce(jnp.add, leaves)


def pcg(A: Callable, b, x0=None, M_inv: Callable | None = None,
        dot: Callable = tree_dot, tol: float = 1e-8, maxiter: int = 100,
        min_iter: int = 0) -> CGResult:
    """Solve A x = b with preconditioned CG.

    A, M_inv: linear callables on the solution pytree; `dot` must be the
    inner product under which A and M_inv are self-adjoint positive (for alm
    pytrees pass the epsilon-weighted dot, mirroring mpi_dot_product,
    comm_utils.f90:599).
    """
    if M_inv is None:
        M_inv = lambda r: r
    if x0 is None:
        x0 = jax.tree.map(jnp.zeros_like, b)

    r0 = jax.tree.map(jnp.subtract, b, A(x0))
    z0 = M_inv(r0)
    bnorm = jnp.sqrt(dot(b, b))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        i, x, r, z, p, rz, rnorm = state
        return (i < maxiter) & ((rnorm / bnorm > tol) | (i < min_iter))

    def body(state):
        i, x, r, z, p, rz, _ = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = jax.tree.map(lambda u, v: u + alpha * v, x, p)
        r = jax.tree.map(lambda u, v: u - alpha * v, r, Ap)
        z = M_inv(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = jax.tree.map(lambda u, v: u + beta * v, z, p)
        rnorm = jnp.sqrt(dot(r, r))
        return (i + 1, x, r, z, p, rz_new, rnorm)

    init = (jnp.asarray(0), x0, r0, z0, z0, dot(r0, z0), jnp.sqrt(dot(r0, r0)))
    i, x, r, z, p, rz, rnorm = jax.lax.while_loop(cond, body, init)
    rel = rnorm / bnorm
    return CGResult(x=x, iters=i, rel_res=rel, converged=rel <= tol)
