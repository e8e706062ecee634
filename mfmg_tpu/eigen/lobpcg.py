"""Batched LOBPCG — the TPU-native form of the reference's Anasazi adapter.

The reference runs Trilinos Anasazi's LOBPCG per agglomerate under WorkStream
threads (dealii/anasazi.templates.hpp:36-105, "SM" smallest-magnitude,
Hermitian, optional full orthogonalization, non-relative tolerance), with an
optional warm start reusing previous eigenvectors
(amge_host.templates.hpp:226-266, the "anasazi_init_guess" golden family).

Here all agglomerates iterate TOGETHER: one `lax.scan` whose carried state is
the batched block (n_agg, m, 3*nev) and whose body is batched dense algebra —
the per-iteration Rayleigh-Ritz is a batched eigh of (3*nev x 3*nev) blocks
on the MXU.  Fixed iteration count with masked convergence (residual-frozen
blocks), mirroring the batched-Lanczos design.
"""

from __future__ import annotations

import numpy as np

from mfmg_tpu.eigen.batched_eigh import CONSTRAINED_DIAG


def _build_batched_operator(batch, constrained_mode):
    M = batch.A_agg.copy()
    ar = np.arange(batch.m_max)
    if constrained_mode == "pin":
        shifts = (batch.diag * batch.valid).sum(axis=1) / batch.sizes
    else:
        shifts = np.zeros(batch.n_agg)
    M[:, ar, ar] += shifts[:, None] * batch.valid
    di = M[:, ar, ar]
    if constrained_mode in ("pin", "identity"):
        di = np.where(batch.constrained, CONSTRAINED_DIAG, di)
    pad_value = 100.0 * max(np.abs(M).max(), CONSTRAINED_DIAG)
    di = np.where(~batch.valid, pad_value, di)
    M[:, ar, ar] = di
    return M, shifts


def batched_lobpcg_smallest(batch, eig_cfg, constrained_mode: str = "pin",
                            initial_guess: np.ndarray | None = None,
                            max_iterations: int | None = None):
    """Smallest eigenpairs of every agglomerate via one batched LOBPCG.

    initial_guess: optional (n_agg, m_max, n_ev) warm start (the reference's
    use_initial_guess path reusing the previous setup's eigenvectors).
    Returns (evals (n_agg, n_ev), evecs (n_agg, m_max, n_ev)).

    Tolerance and iteration cap come from the eigensolver config (the
    Anasazi adapter's non-relative user tolerance and max_iterations,
    anasazi.templates.hpp:36-105) — with a floor of 1e-8 on the tolerance:
    the batched float iteration cannot meaningfully resolve residuals below
    roundoff of the Rayleigh quotients, where the reference's double-
    precision Anasazi can (documented deviation).
    """
    import jax
    import jax.numpy as jnp

    n_ev = eig_cfg.n_eigenvectors
    tol = max(eig_cfg.tolerance, 1e-8)
    if max_iterations is None:
        max_iterations = eig_cfg.max_iterations
    n_agg, m = batch.dof_map.shape
    Mop, shifts = _build_batched_operator(batch, constrained_mode)
    A = jnp.asarray(Mop)

    mask = batch.valid & ~batch.constrained
    rng = np.random.default_rng(0)
    if initial_guess is None:
        X0 = rng.uniform(0.0, 1.0, size=(n_agg, m, n_ev))
    else:
        X0 = np.array(initial_guess, dtype=float)
        # re-randomize zero columns (reference fixes degenerate warm starts,
        # amge_host.templates.hpp:244-265)
        dead = np.linalg.norm(X0, axis=1) < 1e-14
        X0 = np.where(dead[:, None, :], rng.uniform(size=X0.shape), X0)
    X0 = X0 * mask[:, :, None]

    def b_orth(X):
        # batched QR orthonormalization
        Q, _ = jnp.linalg.qr(X)
        return Q

    def rayleigh_ritz(S):
        # S: (n_agg, m, k) basis -> smallest n_ev Ritz pairs
        Q = b_orth(S)
        T = jnp.einsum("gmi,gmn,gnj->gij", Q, A, Q)
        T = 0.5 * (T + jnp.swapaxes(T, 1, 2))
        w, V = jnp.linalg.eigh(T)
        return w[:, :n_ev], jnp.einsum("gmk,gkj->gmj", Q, V[:, :, :n_ev])

    def body(carry, _):
        X, P, theta = carry
        AX = jnp.einsum("gmn,gnk->gmk", A, X)
        R = AX - X * theta[:, None, :]
        S = jnp.concatenate([X, R, P], axis=2)
        Q = b_orth(S)
        T = jnp.einsum("gmi,gmn,gnj->gij", Q, A, Q)
        T = 0.5 * (T + jnp.swapaxes(T, 1, 2))
        w, V = jnp.linalg.eigh(T)
        Xn = jnp.einsum("gmk,gkj->gmj", Q, V[:, :, :n_ev])
        # conjugate direction: new iterate minus its projection on the old
        proj = jnp.einsum("gmk,gnk,gnj->gmj", X, X, Xn)
        Pn = Xn - proj
        return (Xn, Pn, w[:, :n_ev]), w[:, :n_ev]

    X = jnp.asarray(X0)
    theta0, X = rayleigh_ritz(X)
    P = jnp.zeros_like(X)
    (X, P, theta), _ = jax.lax.scan(body, (X, P, theta0), None,
                                    length=max_iterations)
    evals = np.asarray(theta, dtype=np.float64) - shifts[:, None]
    evecs = np.asarray(X, dtype=np.float64)
    # normalize + zero padding
    evecs = evecs * batch.valid[:, :, None]
    nrm = np.linalg.norm(evecs, axis=1, keepdims=True)
    evecs = np.where(nrm > 0, evecs / np.where(nrm == 0, 1, nrm), evecs)
    return evals, evecs
