"""Coarsest-level solvers.

Analog of the reference's DealIISolver (Amesos-KLU direct / ML,
source/dealii/dealii_solver.cc:25-87) and CudaSolver (cusolver
cholesky/lu_dense, source/cuda/cuda_solver.cu:42-515).

On TPU the coarse problem (n_agglomerates x n_eigenvectors dofs, tiny compared
to the fine grid) is solved densely: Cholesky-factorize once at setup, two
triangular solves per V-cycle.  The factor lives on device, so the coarse
solve costs one small batched triangular solve instead of a host round-trip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DirectCoarseSolver:
    """Dense direct solve applied as one matmul: x = A_c^+ b.

    The pseudoinverse (eigh with relative cutoff) is used instead of a
    Cholesky/LU factorization because AMGe coarse matrices can be *exactly*
    consistent-singular: overlapping agglomerate eigenvectors may produce
    linearly dependent restriction rows (observed on symmetric meshes; the
    reference's KLU/cusolver LU factors these by luck of pivoting, relying on
    prolongation to annihilate the null-space junk).  A_c^+ b is the exact
    solution of the consistent system, and a dense matmul is the fastest
    possible coarse apply on the MXU.
    """

    inv: jax.Array                # dense pseudoinverse of A_c

    def apply(self, b):
        return self.inv @ b


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CGCoarseSolver:
    """Iterative coarse solve (unpreconditioned CG on the coarse ELL matrix)."""
    op: object
    tol: float = dataclasses.field(metadata=dict(static=True), default=1e-12)
    maxiter: int = dataclasses.field(metadata=dict(static=True), default=200)

    def apply(self, b):
        from mfmg_tpu.solve.cg import cg_solve
        x, _ = cg_solve(self.op, b, tol=self.tol, maxiter=self.maxiter)
        return x


def build_coarse_solver(A_c: sp.spmatrix, coarse_cfg, dtype=jnp.float64):
    """Factory (analog of HierarchyHelpers::build_coarse_solver)."""
    ctype = coarse_cfg.type.strip().lower()
    if ctype in ("direct", "cholesky", "lu_dense", "ml", "amesos-klu"):
        Ad = np.asarray(A_c.todense())
        # Symmetrize against assembly roundoff.
        Ad = 0.5 * (Ad + Ad.T)
        n = Ad.shape[0]
        if n >= 2048 and dtype != jnp.float64:
            # Large coarse problems: jittered float32 Cholesky inverse on the
            # host (7.4s at n=8192, vs minutes for host eigh or the tunneled
            # device path).  The tiny relative jitter keeps the factorization
            # of consistent-singular coarse matrices stable.
            import scipy.linalg
            A32 = Ad.astype(np.float32)
            jitter = np.float32(1e-6 * (np.trace(A32) / n))
            try:
                c = scipy.linalg.cho_factor(A32 + jitter * np.eye(n, dtype=np.float32))
                inv = scipy.linalg.cho_solve(c, np.eye(n, dtype=np.float32))
                if np.all(np.isfinite(inv)):
                    return DirectCoarseSolver(inv=jnp.asarray(inv, dtype=dtype))
            except scipy.linalg.LinAlgError:
                pass                      # fall through to the eigh pinv
        # Eigendecompose, invert above a relative cutoff (rank-deficient
        # coarse systems are consistent; see DirectCoarseSolver docstring).
        w, V = np.linalg.eigh(Ad)
        cut = w > 1e-10 * max(w[-1], 0.0)
        inv = (V[:, cut] / w[cut]) @ V[:, cut].T
        return DirectCoarseSolver(inv=jnp.asarray(inv, dtype=dtype))
    if ctype == "cg":
        from mfmg_tpu.ops.sparse import ell_from_scipy
        return CGCoarseSolver(op=ell_from_scipy(A_c, dtype=dtype),
                              tol=coarse_cfg.tolerance, maxiter=coarse_cfg.max_iterations)
    raise ValueError(f"unknown coarse solver type {coarse_cfg.type!r}")
