"""Preconditioned conjugate gradients.

Analog of the reference's use of dealii::SolverCG with the Hierarchy as
preconditioner (tests/laplace.hpp:206-219, hierarchy_driver.cc:104-116).
Jittable: fixed-structure lax.while_loop, preconditioner passed as a callable
closed over hierarchy data.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mfmg_tpu.solve.operator import apply_op


def cg_solve(op, b, preconditioner=None, x0=None, tol=1e-12, maxiter=1000):
    """Solve A x = b.  Returns (x, info_dict) with iterations and relative
    residual.  Convergence criterion ||r|| <= tol * ||b|| (matching
    laplace.hpp:211-212 which uses 1e-12 * ||b||)."""
    if preconditioner is None:
        preconditioner = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)

    b_norm = jnp.linalg.norm(b)
    atol = tol * jnp.where(b_norm > 0, b_norm, 1.0)

    r0 = b - apply_op(op, x0)
    z0 = preconditioner(r0)
    state0 = (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.asarray(0, dtype=jnp.int32))

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.linalg.norm(r) > atol) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = apply_op(op, p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = preconditioner(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(cond, body, state0)
    return x, {"iterations": k, "relres": jnp.linalg.norm(r) / jnp.where(b_norm > 0, b_norm, 1.0)}
