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
"""

from __future__ import annotations

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


def build_recursive_restriction(mesh: Mesh, A_loc: np.ndarray,
                                cell_agg_prev: np.ndarray,
                                R_prev_local: sp.csr_matrix,
                                A_coarse_prev: sp.csr_matrix,
                                boundary_dofs: np.ndarray,
                                n_ev: int, block_dims) -> tuple:
    """One more AMGe level; returns (R_l csr over previous coarse, cell_super).

    Dirichlet handling: constrained fine dofs are eliminated from the patch
    operator and the Gram (their R-row values zeroed), mirroring the level-0
    elimination.
    """
    super_of_agg, super_grid = group_agglomerates(mesh, cell_agg_prev, block_dims)
    cell_super = super_of_agg[cell_agg_prev]
    n_super = int(cell_super.max()) + 1
    coarse_diag = np.asarray(A_coarse_prev.diagonal())

    R = R_prev_local.tocsr()
    R_csc = R.tocsc()
    dof_rows, dof_vals = _dof_row_structure(R)
    con_cell = boundary_dofs[mesh.cells]                   # (n_cells, n_loc)

    rows_out, cols_out, vals_out = [], [], []
    order = np.argsort(cell_super, kind="stable")
    counts = np.bincount(cell_super, minlength=n_super)
    offsets = np.concatenate([[0], np.cumsum(counts)])

    for G in range(n_super):
        cells_G = order[offsets[G]: offsets[G + 1]]
        cdofs = mesh.cells[cells_G]                        # (nc, n_loc)
        D_G = np.unique(cdofs)
        member_rows = np.unique(dof_rows[D_G])
        member_rows = member_rows[member_rows >= 0]
        m1 = len(member_rows)
        if m1 == 0:
            continue

        # Per-cell SMALL local row bases: each cell touches <= n_loc*q rows
        # but typically ~16; building (nc, m1, n_loc) dense bases makes the
        # Galerkin contraction O(nc m1^2 n_loc) — catastrophic for large
        # supers (m1 ~ 400).  Instead: unique rows per cell (r_max ~ 16),
        # tiny per-cell K_c = Rl_c A_c Rl_c^T, scatter into A1.
        cr = dof_rows[cdofs]                               # (nc, n_loc, q)
        cv = dof_vals[cdofs]
        cv = np.where(con_cell[cells_G][:, :, None], 0.0, cv)   # eliminate
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
        crows[ci_f[new], widx[new]] = srt[new]             # sorted, BIG-padded
        # slot -> position within crows (row-wise searchsorted via counting)
        tgt = np.where(cr < 0, BIG - 1, cr).reshape(nc, -1)
        pos_small = (crows[:, None, :] < tgt[:, :, None]).sum(axis=2)
        pos_small = np.minimum(pos_small, r_max - 1).reshape(cr.shape)
        Rl_c = np.zeros((nc, r_max, n_loc))
        ci = np.broadcast_to(np.arange(nc)[:, None, None], cr.shape)
        li = np.broadcast_to(np.arange(n_loc)[None, :, None], cr.shape)
        valid = cr >= 0
        Rl_c[ci[valid], pos_small[valid], li[valid]] = cv[valid]

        K = np.einsum("cri,cij,csj->crs", Rl_c, A_loc[cells_G], Rl_c,
                      optimize=True)                       # (nc, r_max, r_max)
        gpos = np.searchsorted(member_rows, np.minimum(crows, member_rows[-1]))
        row_ok = crows < BIG
        A1 = np.zeros((m1, m1))
        pi = np.broadcast_to(gpos[:, :, None], K.shape)
        pj = np.broadcast_to(gpos[:, None, :], K.shape)
        ok = row_ok[:, :, None] & row_ok[:, None, :]
        np.add.at(A1, (pi[ok], pj[ok]), K[ok])
        A1 = 0.5 * (A1 + A1.T)
        diag1 = np.diag(A1).copy()

        # patch Gram M = sum_{d in D_G} r_d r_d^T, as a small sparse product
        # (R rows are zero at constrained dofs, so no extra elimination)
        Rsub = R_csc[:, D_G].tocsr()[member_rows]
        M = np.asarray((Rsub @ Rsub.T).todense())
        M = 0.5 * (M + M.T)

        # SVD-reduced eigenproblem (degenerate-pencil-safe)
        lam, Q = np.linalg.eigh(M)
        r = int(np.sum(lam > 1e-10 * max(lam[-1], 1e-300)))
        if r == 0:
            continue
        W = Q[:, m1 - r:] / np.sqrt(lam[m1 - r:])
        A_red = W.T @ A1 @ W
        A_red = 0.5 * (A_red + A_red.T)
        w_, y_ = np.linalg.eigh(A_red)
        kk = min(n_ev, r)
        w_pou = diag1 / coarse_diag[member_rows]
        for j in range(kk):
            c_j = W @ y_[:, j]
            rows_out.append(np.full(m1, G * n_ev + j))
            cols_out.append(member_rows)
            vals_out.append(w_pou * c_j)

    R_l = sp.csr_matrix((np.concatenate(vals_out),
                         (np.concatenate(rows_out), np.concatenate(cols_out))),
                        shape=(n_super * n_ev, A_coarse_prev.shape[0]))
    nonzero = np.diff(R_l.indptr) > 0
    return R_l[nonzero], cell_super, super_grid
