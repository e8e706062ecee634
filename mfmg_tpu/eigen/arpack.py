"""Shift-invert ARPACK eigensolver — the reference's "arpack" dispatch.

The reference's matrix path solves each agglomerate eigenproblem with
deal.II's ArpackSolver in SHIFT-INVERT mode: factorize the (shifted, pinned)
local matrix with UMFPACK and run ARPACK on its inverse, so the smallest
eigenpairs arrive as the LARGEST of the inverse, with 2*nev+2 Arnoldi
vectors (amge_host.templates.hpp:350-483, n_arnoldi at :416).

This module is the genuine analog (not the round-1/2 alias onto exact eigh):
scipy.sparse.linalg.eigsh wraps the same Fortran ARPACK the reference links,
and is called per agglomerate in shift-invert mode (sigma=0, which="LM",
ncv=2*nev+2) under the same host thread pool as the batched LAPACK path —
threading replaces the reference's WorkStream.  The spectral coarse SPACE is
eigensolver-invariant (spans agree to the tolerance), which is why the
reference's arpack and lanczos golden rates coincide (test_hierarchy.cc:
343,352) — asserted in tests/test_hierarchy.py.
"""

from __future__ import annotations

import os

import numpy as np

from mfmg_tpu.eigen.lobpcg import _build_batched_operator


def batched_arpack_smallest(batch, eig_cfg, constrained_mode: str = "pin"):
    """Smallest eigenpairs of every agglomerate via shift-invert ARPACK.

    Returns (evals (n_agg, n_ev), evecs (n_agg, m_max, n_ev)), padded with
    zeros like the other batched eigensolvers.
    """
    from scipy.sparse.linalg import eigsh

    n_ev = eig_cfg.n_eigenvectors
    n_agg, m = batch.dof_map.shape
    Mop, shifts = _build_batched_operator(batch, constrained_mode)

    evals = np.zeros((n_agg, n_ev))
    evecs = np.zeros((n_agg, m, n_ev))
    # reference initial guess: uniform random, zero at constrained dofs
    # (dealii_mesh_evaluator.cc:43-55)
    rng = np.random.default_rng(0)

    def _dense_fallback(g, Mg, sz):
        # dense subset eigh — used when the agglomerate is too small for the
        # Arnoldi basis (scipy needs n_ev < ncv <= sz) or when sigma=0
        # shift-invert hits a singular local operator (interior Neumann
        # agglomerates under constrained_mode='raw'/'identity').  An
        # agglomerate with fewer dofs than n_ev yields only sz eigenpairs;
        # the remainder stay zero-padded (matching the batched arrays).
        import scipy.linalg as sla
        ne = min(n_ev, sz)
        w, v = sla.eigh(Mg, subset_by_index=[0, ne - 1], driver="evr",
                        check_finite=False)
        evals[g, :ne] = w[:ne] - shifts[g]
        evecs[g, :sz, :ne] = v[:, :ne]

    def _solve_range(lo, hi):
        for g in range(lo, hi):
            sz = int(batch.sizes[g])
            Mg = np.asarray(Mop[g, :sz, :sz], dtype=np.float64)
            if sz < 2 * n_ev + 3:
                _dense_fallback(g, Mg, sz)
                continue
            ncv = min(2 * n_ev + 2, sz)          # n_arnoldi (templates.hpp:416)
            v0 = rng.uniform(0.0, 1.0, size=sz)
            v0[np.asarray(batch.constrained[g, :sz])] = 0.0
            if not v0.any():
                v0 = None
            try:
                w, v = eigsh(Mg, k=n_ev, sigma=0.0, which="LM", ncv=ncv,
                             tol=eig_cfg.tolerance, v0=v0,
                             maxiter=eig_cfg.max_iterations * sz)
            except Exception:
                _dense_fallback(g, Mg, sz)       # singular factorization etc.
                continue
            order = np.argsort(w)
            evals[g] = w[order] - shifts[g]
            evecs[g, :sz] = v[:, order]

    n_workers = min(os.cpu_count() or 1, 8)
    if n_workers > 1 and n_agg >= 4 * n_workers:
        from concurrent.futures import ThreadPoolExecutor

        from mfmg_tpu.utils.threads import blas_single_thread
        bounds = np.linspace(0, n_agg, n_workers + 1).astype(int)
        with blas_single_thread():
            with ThreadPoolExecutor(n_workers) as pool:
                for f in [pool.submit(_solve_range, bounds[k], bounds[k + 1])
                          for k in range(n_workers)]:
                    f.result()
    else:
        _solve_range(0, n_agg)
    evecs = evecs * batch.valid[:, :, None]
    return evals, evecs
