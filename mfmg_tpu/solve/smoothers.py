"""Smoothers.

All smoothers implement the reference contract (common/smoother.hpp:23-43):
``x <- x + B^{-1}(b - A x)`` coded via the negative-residual trick exactly as
the reference does (dealii_smoother.cc:69-81, cuda_smoother.cu:39-60).

TPU-native selection:
  * Jacobi — the reference's device smoother (cuda_smoother.cu); one fused
    elementwise pass after the SpMV.
  * Chebyshev — the reference's matrix-free smoother
    (dealii_matrix_free_smoother.cc); polynomial in D^{-1}A, pure
    SpMV/elementwise, the natural high-performance TPU smoother.  Parameter
    semantics follow deal.II PreconditionChebyshev: the eigenvalue interval is
    [max_ev/smoothing_range, max_ev] when smoothing_range > 1, otherwise
    [min_est, max_ev], with max_ev = 1.2 x Lanczos estimate when not given.
  * "gauss-seidel"/"symmetric gauss-seidel" map to Jacobi-damped variants for
    now (sequential triangular sweeps do not map to TPU); multicolor GS is the
    planned native equivalent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mfmg_tpu.solve.operator import apply_op, operator_diagonal


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class JacobiSmoother:
    inv_diag: jax.Array
    omega: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    def apply(self, op, b, x):
        # x += omega * D^{-1} (b - A x)   [negative-residual form]
        r = apply_op(op, x) - b
        return x - self.omega * self.inv_diag * r


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChebyshevSmoother:
    inv_diag: jax.Array
    theta: jax.Array          # (lmax + lmin) / 2 of D^{-1}A interval
    delta: jax.Array          # (lmax - lmin) / 2
    degree: int = dataclasses.field(metadata=dict(static=True), default=1)

    def apply(self, op, b, x):
        r = apply_op(op, x) - b          # negative residual
        dx = _chebyshev_vmult(self, op, r)
        return x - dx

    # mfmg applies the polynomial with the smoother's own operator; expose the
    # raw preconditioner action too for reuse in eigenvalue estimation.


def _chebyshev_vmult(sm: ChebyshevSmoother, op, src):
    """dst = p_degree(D^{-1}A) D^{-1} src — Chebyshev acceleration of Jacobi,
    zero initial guess (matches dealii::PreconditionChebyshev::vmult)."""
    theta, delta = sm.theta, sm.delta
    x = jnp.zeros_like(src)
    r = src
    p = jnp.zeros_like(src)
    alpha = jnp.asarray(0.0, dtype=src.dtype)
    for i in range(1, sm.degree + 1):
        z = sm.inv_diag * r
        if i == 1:
            p = z
            alpha = 1.0 / theta
        else:
            beta = (delta * alpha / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            p = z + beta * p
        x = x + alpha * p
        if i < sm.degree:
            r = src - apply_op(op, x)
    return x


def estimate_extreme_eigenvalues(op, inv_diag, n_iter: int = 20, seed: int = 7):
    """Estimate (lmin, lmax) of D^{-1}A by Lanczos on the symmetrized
    operator D^{-1/2} A D^{-1/2} (same spectrum).

    Analog of deal.II's CG-Lanczos estimate used by PreconditionChebyshev
    (consumed at dealii_matrix_free_smoother.cc:34-56).  Runs at setup; host
    tridiagonal eigensolve of a tiny matrix.
    """
    n = inv_diag.shape[0]
    sqrt_dinv = jnp.sqrt(inv_diag)

    def matvec(v):
        return sqrt_dinv * apply_op(op, sqrt_dinv * v)

    n_iter = min(n_iter, n)
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.uniform(0.0, 1.0, size=n), dtype=inv_diag.dtype)
    v = v / jnp.linalg.norm(v)
    alphas, betas = [], []
    v_prev = jnp.zeros_like(v)
    beta = 0.0
    for _ in range(n_iter):
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - beta * v_prev
        alphas.append(float(alpha))
        beta_new = jnp.linalg.norm(w)
        if float(beta_new) < 1e-30:
            break
        v_prev = v
        v = w / beta_new
        beta = beta_new
        betas.append(float(beta_new))
    T = np.diag(alphas) + np.diag(betas[: len(alphas) - 1], 1) + np.diag(betas[: len(alphas) - 1], -1)
    ev = np.linalg.eigvalsh(T)
    return float(ev[0]), float(ev[-1])


def build_smoother(op, smoother_cfg, dtype=jnp.float64):
    """Factory (analog of HierarchyHelpers::build_smoother)."""
    diag = operator_diagonal(op)
    inv_diag = jnp.where(diag != 0, 1.0 / diag, 0.0).astype(dtype)
    stype = smoother_cfg.type.strip().lower()
    if stype in ("jacobi",):
        return JacobiSmoother(inv_diag=inv_diag, omega=smoother_cfg.jacobi_omega)
    if stype in ("gauss-seidel", "symmetric gauss-seidel", "sgs", "gs"):
        # TPU-native stand-in: damped Jacobi (sequential sweeps don't map to
        # the hardware). Multicolor GS planned; rates differ from the
        # reference's lexicographic SGS.
        return JacobiSmoother(inv_diag=inv_diag, omega=smoother_cfg.jacobi_omega)
    if stype == "chebyshev":
        if smoother_cfg.max_eigenvalue is not None:
            lmax = float(smoother_cfg.max_eigenvalue)
            lmin_est = lmax / 20.0
        else:
            lmin_est, lmax_est = estimate_extreme_eigenvalues(
                op, inv_diag, n_iter=max(smoother_cfg.eig_cg_n_iterations, 40))
            lmax = 1.2 * lmax_est          # deal.II safety factor
            lmin_est = max(lmin_est, 1e-12)
        if smoother_cfg.smoothing_range > 1.0:
            lmin = lmax / smoother_cfg.smoothing_range
        else:
            lmin = lmin_est
        theta = jnp.asarray((lmax + lmin) / 2.0, dtype=dtype)
        delta = jnp.asarray((lmax - lmin) / 2.0, dtype=dtype)
        return ChebyshevSmoother(inv_diag=inv_diag, theta=theta, delta=delta,
                                 degree=smoother_cfg.degree)
    raise ValueError(f"unknown smoother type {smoother_cfg.type!r}")
