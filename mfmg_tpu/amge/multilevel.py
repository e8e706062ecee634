"""Recursive spectral AMGe: deeper levels built with the same machinery.

The reference caps its own AMGe at 2 levels and delegates deeper hierarchies
to ML/AMGX coarse solvers (hierarchy.hpp:172, dealii_solver.cc).  Here level
l >= 1 repeats the level-0 construction on super-agglomerates:

  * level-l agglomerates = groups of level-(l-1) agglomerates,
  * the local operator of super-agglomerate G is the Galerkin restriction of
    G's *Neumann-assembled fine* patch:  A_G^(l) = R_G A_G R_G^T, assembled
    WITHOUT materializing the fine patch: per fine cell c the coarse-local
    matrix K_c = R_c A_c R_c^T (a ~16x16 block over the coarse dofs touching
    c) is exact, and sum_{c in G} scatter(K_c) = A_G^(l) — the same batched
    scatter pattern as level 0, so setup stays O(n_cells) at every level,
  * the local space spans every previous-level coarse dof whose support
    touches G (members + boundary ring — the analog of shared nodes),
  * the eigenproblem is solved in the orthonormalized function space via the
    patch Gram M_G = R_G R_G^T (also assembled dof-wise, never in the fine
    space): overlapping PoU rows can be exactly dependent, so the naive
    generalized pencil is degenerate; with M_G = Q L Q^T (rank r) we solve
    W^T A_G^(l) W for W = Q_r L_r^{-1/2} and map back c_j = W y_j,
  * PoU weights w_i = diag(A_G^(l))_i / diag(A_l)_i; every fine cell belongs
    to exactly one super-agglomerate, so the partition of unity telescopes
    through all levels.

Everything up to the per-super dense eigensolves is ONE pass of global numpy
array ops (the per-cell K blocks, the member-row tables, and both padded
batch scatters go through np.bincount); only the rank-revealing LAPACK stage
loops over supers, under a thread pool (LAPACK releases the GIL) — the same
threading-over-agglomerates shape as the reference's WorkStream
(amge_host.templates.hpp:508-519).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import scipy.sparse as sp

from mfmg_tpu.fem.mesh import Mesh


def group_agglomerates(mesh: Mesh, agg_ids: np.ndarray, block_dims) -> np.ndarray:
    """super_of_agg: (n_agg,) group id for each previous-level agglomerate
    (centroid-layer blocking — exact for structured agglomerate grids)."""
    n_agg = int(agg_ids.max()) + 1
    centroids = np.zeros((n_agg, mesh.dim))
    counts = np.bincount(agg_ids, minlength=n_agg).astype(float)
    cell_centers = mesh.nodes[mesh.cells].mean(axis=1)
    np.add.at(centroids, agg_ids, cell_centers)
    centroids /= counts[:, None]

    super_mi = np.zeros((n_agg, mesh.dim), dtype=np.int64)
    for d in range(mesh.dim):
        vals = np.round(centroids[:, d] / max(1e-12, np.ptp(centroids[:, d]) + 1e-30) * 1e8)
        _, layer = np.unique(vals, return_inverse=True)
        super_mi[:, d] = layer // block_dims[d]
    out = np.zeros(n_agg, dtype=np.int64)
    stride = 1
    grid = []
    for d in range(mesh.dim):
        n_d = int(super_mi[:, d].max()) + 1
        grid.append(n_d)
        out += super_mi[:, d] * stride
        stride *= n_d
    _, out = np.unique(out, return_inverse=True)
    return out, tuple(grid)


def _dof_row_structure(R: sp.csr_matrix):
    """Padded per-dof (rows, values) of R's columns: which coarse rows touch
    each fine dof.  (n_dofs, q_max) with -1 padding."""
    C = R.tocsc()
    n_dofs = C.shape[1]
    q = np.diff(C.indptr)
    q_max = int(q.max()) if n_dofs else 0
    rows = -np.ones((n_dofs, q_max), dtype=np.int64)
    vals = np.zeros((n_dofs, q_max))
    if C.nnz:
        d_idx = np.repeat(np.arange(n_dofs), q)
        pos = np.arange(C.nnz) - np.repeat(C.indptr[:-1], q)
        rows[d_idx, pos] = C.indices
        vals[d_idx, pos] = C.data
    return rows, vals


def _batched_scatter(flat_idx: np.ndarray, weights: np.ndarray, size: int):
    """sum weights into a flat array (histogram scatter; ~5x np.add.at)."""
    return np.bincount(flat_idx.ravel(), weights=weights.ravel(), minlength=size)


def build_recursive_restriction(mesh: Mesh, A_loc: np.ndarray,
                                cell_agg_prev: np.ndarray,
                                R_prev_local: sp.csr_matrix,
                                A_coarse_prev: sp.csr_matrix,
                                boundary_dofs: np.ndarray,
                                n_ev: int, block_dims) -> tuple:
    """One more AMGe level; returns (R_l csr over previous coarse, cell_super,
    super_grid).

    Dirichlet handling: constrained fine dofs are eliminated from the patch
    operator and the Gram (their R-row values zeroed), mirroring the level-0
    elimination.
    """
    super_of_agg, super_grid = group_agglomerates(mesh, cell_agg_prev, block_dims)
    cell_super = super_of_agg[cell_agg_prev]
    n_super = int(cell_super.max()) + 1
    n_rows_prev = A_coarse_prev.shape[0]
    coarse_diag = np.asarray(A_coarse_prev.diagonal())

    R = R_prev_local.tocsr()
    dof_rows, dof_vals = _dof_row_structure(R)
    con_cell = boundary_dofs[mesh.cells]                   # (n_cells, n_loc)

    # ---- per-cell coarse row bases, globally batched --------------------
    cdofs = mesh.cells.astype(np.int64)                    # (nc, n_loc)
    cr = dof_rows[cdofs]                                   # (nc, n_loc, q)
    cv = dof_vals[cdofs]
    cv = np.where(con_cell[:, :, None], 0.0, cv)           # eliminate
    nc, n_loc, qm = cr.shape
    BIG = np.iinfo(np.int64).max
    allr = np.where(cr < 0, BIG, cr).reshape(nc, -1)
    srt = np.sort(allr, axis=1)
    new = np.concatenate([np.ones((nc, 1), bool),
                          srt[:, 1:] != srt[:, :-1]], axis=1) & (srt < BIG)
    counts_r = new.sum(axis=1)
    r_max = max(int(counts_r.max()), 1)
    crows = np.full((nc, r_max), BIG, dtype=np.int64)
    widx = np.cumsum(new, axis=1) - 1
    ci_f = np.broadcast_to(np.arange(nc)[:, None], new.shape)
    crows[ci_f[new], widx[new]] = srt[new]                 # sorted, BIG-padded
    # slot -> position within crows (row-wise searchsorted via counting)
    tgt = np.where(cr < 0, BIG - 1, cr).reshape(nc, -1)
    pos_small = (crows[:, None, :] < tgt[:, :, None]).sum(axis=2)
    pos_small = np.minimum(pos_small, r_max - 1).reshape(cr.shape)
    Rl_c = np.zeros((nc, r_max, n_loc))
    ci = np.broadcast_to(np.arange(nc)[:, None, None], cr.shape)
    li = np.broadcast_to(np.arange(n_loc)[None, :, None], cr.shape)
    valid = cr >= 0
    Rl_c[ci[valid], pos_small[valid], li[valid]] = cv[valid]

    K = np.einsum("cri,cij,csj->crs", Rl_c, A_loc, Rl_c,
                  optimize=True)                           # (nc, r_max, r_max)

    # ---- member-row table per super -------------------------------------
    row_ok = crows < BIG
    keys_cell = np.where(row_ok, cell_super[:, None] * n_rows_prev + crows, -1)
    member_keys = np.unique(keys_cell[row_ok])             # G-major, row-ascending
    key_super = member_keys // n_rows_prev
    m1s = np.bincount(key_super, minlength=n_super)
    offs = np.concatenate([[0], np.cumsum(m1s)])
    m1_max = int(m1s.max()) if n_super else 0
    member_pad = np.zeros((n_super, m1_max), dtype=np.int64)
    within = np.arange(len(member_keys)) - offs[key_super]
    member_pad[key_super, within] = member_keys % n_rows_prev

    # ---- A1 batch: scatter all K blocks (dump slot for padding) ---------
    m1p = m1_max + 1
    gpos = np.where(row_ok,
                    np.searchsorted(member_keys, np.where(row_ok, keys_cell, 0))
                    - offs[np.minimum(cell_super[:, None], n_super - 1)],
                    m1_max)                                # (nc, r_max)
    GG = cell_super[:, None, None]
    flat = (GG * m1p + gpos[:, :, None]) * m1p + gpos[:, None, :]
    A1 = _batched_scatter(flat, K, n_super * m1p * m1p).reshape(n_super, m1p, m1p)
    A1 = A1[:, :m1_max, :m1_max]
    A1 = 0.5 * (A1 + np.swapaxes(A1, 1, 2))

    # ---- Gram batch: M_G = sum_{d in D_G} r_d r_d^T ----------------------
    keyd = np.unique(cell_super[:, None] * np.int64(mesh.n_nodes)
                     + cdofs)                              # (G, dof) pairs
    pg, pd = keyd // mesh.n_nodes, keyd % mesh.n_nodes
    prows = dof_rows[pd]                                   # (np, q)
    pvals = dof_vals[pd]
    p_ok = prows >= 0
    pkeys = np.where(p_ok, pg[:, None] * n_rows_prev + prows, 0)
    ppos = np.where(p_ok,
                    np.searchsorted(member_keys, pkeys) - offs[pg][:, None],
                    m1_max)
    flatm = (pg[:, None, None] * m1p + ppos[:, :, None]) * m1p + ppos[:, None, :]
    outer = pvals[:, :, None] * pvals[:, None, :]
    M = _batched_scatter(flatm, outer, n_super * m1p * m1p).reshape(n_super, m1p, m1p)
    M = M[:, :m1_max, :m1_max]
    M = 0.5 * (M + np.swapaxes(M, 1, 2))

    # ---- per-super rank-revealing eigensolves (threaded LAPACK) ----------
    import os
    import scipy.linalg as sla

    diag1 = np.einsum("gii->gi", A1)
    cols_pad = np.zeros((n_super, n_ev, m1_max))
    kks = np.zeros(n_super, dtype=np.int64)

    def _solve_range(lo, hi):
        for G in range(lo, hi):
            m1 = int(m1s[G])
            if m1 == 0:
                continue
            lam, Q = np.linalg.eigh(M[G, :m1, :m1])
            r = int(np.sum(lam > 1e-10 * max(lam[-1], 1e-300)))
            if r == 0:
                continue
            W = Q[:, m1 - r:] / np.sqrt(lam[m1 - r:])
            A_red = W.T @ A1[G, :m1, :m1] @ W
            A_red = 0.5 * (A_red + A_red.T)
            kk = min(n_ev, r)
            w_, y_ = sla.eigh(A_red, subset_by_index=[0, kk - 1],
                              driver="evx", check_finite=False)
            kks[G] = kk
            w_pou = diag1[G, :m1] / coarse_diag[member_pad[G, :m1]]
            cols_pad[G, :kk, :m1] = (w_pou[:, None] * (W @ y_)).T

    n_workers = min(os.cpu_count() or 1, 8)
    if n_workers > 1 and n_super >= 2 * n_workers:
        bounds = np.linspace(0, n_super, n_workers + 1).astype(int)
        with ThreadPoolExecutor(n_workers) as pool:
            for f in [pool.submit(_solve_range, bounds[t], bounds[t + 1])
                      for t in range(n_workers)]:
                f.result()
    else:
        _solve_range(0, n_super)

    # ---- assemble R_l from the padded per-super blocks -------------------
    gsel, jsel = np.nonzero(np.arange(n_ev)[None] < kks[:, None])
    rows_out = np.repeat(gsel * n_ev + jsel, m1s[gsel])
    mask = np.arange(m1_max)[None] < m1s[gsel][:, None]
    cols_out = member_pad[gsel][mask]
    vals_out = cols_pad[gsel, jsel][mask]
    R_l = sp.csr_matrix((vals_out, (rows_out, cols_out)),
                        shape=(n_super * n_ev, n_rows_prev))
    nonzero = np.diff(R_l.indptr) > 0
    return R_l[nonzero], cell_super, super_grid
