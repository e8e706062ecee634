"""Algebraic (matrix-only) coarsening for multilevel hierarchies.

The reference caps its own AMGe at 2 levels (hierarchy.hpp:172 "max levels"
default 2) and delegates deeper hierarchies to Trilinos ML or AMGX as the
coarse solver.  Here deeper levels are built with our own machinery applied
algebraically: coarse dofs (agglomerate, eigenvector) pairs carry no mesh, so
agglomeration happens on the operator graph and local problems are principal
submatrices.

Each coarse dof belongs to exactly one aggregate (greedy graph aggregation —
the standard smoothed-aggregation root-node scheme), so the partition-of-unity
weights are identically 1 and R rows are just the aggregate-local eigenvectors.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def aggregate_graph(A: sp.csr_matrix, target_size: int) -> np.ndarray:
    """Greedy aggregation of the matrix graph into aggregates of roughly
    target_size dofs.  Returns (n,) aggregate ids."""
    n = A.shape[0]
    A = A.tocsr()
    agg = -np.ones(n, dtype=np.int64)
    next_id = 0
    for root in range(n):
        if agg[root] >= 0:
            continue
        members = [root]
        agg[root] = next_id
        frontier = [root]
        while frontier and len(members) < target_size:
            new_frontier = []
            for u in frontier:
                for v in A.indices[A.indptr[u]: A.indptr[u + 1]]:
                    if agg[v] < 0 and len(members) < target_size:
                        agg[v] = next_id
                        members.append(v)
                        new_frontier.append(v)
            frontier = new_frontier
        next_id += 1
    return agg


def build_algebraic_restriction(A: sp.csr_matrix, cfg,
                                smooth_prolongation: bool = True) -> sp.csr_matrix:
    """Spectral restriction from the operator graph alone.

    Tentative rows are aggregate-local smallest eigenvectors; one damped-
    Jacobi smoothing pass R <- R (I - omega D^{-1} A) (classic smoothed
    aggregation) sharpens the coarse space — the role ML's SA prolongator
    smoothing plays in the reference's "coarse.type=ml" mode.
    """
    n = A.shape[0]
    n_ev = cfg.eigensolver.n_eigenvectors
    target = max(2 * n_ev, 4)
    agg = aggregate_graph(A, target)
    n_agg = int(agg.max()) + 1

    rows, cols, vals = [], [], []
    Ad = A.todense()
    for g in range(n_agg):
        idx = np.nonzero(agg == g)[0]
        m = len(idx)
        sub = np.asarray(Ad[np.ix_(idx, idx)])
        sub = 0.5 * (sub + sub.T)
        k = min(n_ev, m)
        w, v = np.linalg.eigh(sub)
        for j in range(k):
            rows.append(np.full(m, g * n_ev + j))
            cols.append(idx)
            vals.append(v[:, j])
    R = sp.csr_matrix((np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n_agg * n_ev, n))
    nonzero_rows = np.diff(R.indptr) > 0
    R = R[nonzero_rows]

    if smooth_prolongation:
        dinv = 1.0 / A.diagonal()
        DinvA = sp.diags(dinv) @ A
        # power-iteration estimate of lambda_max(D^{-1}A)
        x = np.ones(n)
        for _ in range(20):
            x = DinvA @ x
            nrm = np.linalg.norm(x)
            if nrm == 0:
                break
            x /= nrm
        lmax = float(x @ (DinvA @ x)) if np.linalg.norm(x) > 0 else 2.0
        omega = 4.0 / (3.0 * max(lmax, 1e-12))
        R = (R - omega * (R @ DinvA.T)).tocsr()
    return R
