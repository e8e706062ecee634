"""Recursive spectral AMGe: deeper levels built with the same machinery.

The reference caps its own AMGe at 2 levels and delegates deeper hierarchies
to ML/AMGX coarse solvers (hierarchy.hpp:172, dealii_solver.cc).  Here level
l >= 1 repeats the level-0 construction on super-agglomerates:

  * level-l agglomerates = groups of level-(l-1) agglomerates (block walk on
    the agglomerate grid for structured meshes, greedy graph aggregation of
    the agglomerate adjacency otherwise),
  * the local operator of super-agglomerate G is the Galerkin restriction of
    G's *Neumann-assembled fine* patch:  A_G^(l) = R_G A_G R_G^T, where A_G
    is assembled from G's fine cells only and R_G collects the member
    agglomerates' restriction rows — the textbook spectral-AMGe hierarchy,
  * the local space spans every previous-level coarse dof whose support
    touches G (members + boundary ring — the analog of shared nodes at
    level 0),
  * PoU weights w_i = diag(A_G^(l))_i / diag(A_l)_i; since every fine cell
    belongs to exactly one super-agglomerate, sum_G diag(A_G^(l)) equals the
    Galerkin coarse diagonal exactly and the partition of unity is preserved
    at every level.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from mfmg_tpu.fem.mesh import Mesh


def group_agglomerates(mesh: Mesh, agg_ids: np.ndarray, block_dims) -> np.ndarray:
    """super_of_agg: (n_agg,) group id for each previous-level agglomerate."""
    n_agg = int(agg_ids.max()) + 1
    centroids = np.zeros((n_agg, mesh.dim))
    counts = np.bincount(agg_ids, minlength=n_agg).astype(float)
    cell_centers = mesh.nodes[mesh.cells].mean(axis=1)
    np.add.at(centroids, agg_ids, cell_centers)
    centroids /= counts[:, None]

    # order agglomerate centroids onto a virtual grid: sort by (z, y, x) and
    # use rank-based block grouping per axis
    super_mi = np.zeros((n_agg, mesh.dim), dtype=np.int64)
    for d in range(mesh.dim):
        vals = np.round(centroids[:, d] / max(1e-12, np.ptp(centroids[:, d]) + 1e-30) * 1e8)
        _, layer = np.unique(vals, return_inverse=True)
        super_mi[:, d] = layer // block_dims[d]
    # flatten
    out = np.zeros(n_agg, dtype=np.int64)
    stride = 1
    for d in range(mesh.dim):
        n_d = int(super_mi[:, d].max()) + 1
        out += super_mi[:, d] * stride
        stride *= n_d
    _, out = np.unique(out, return_inverse=True)
    return out


def build_recursive_restriction(mesh: Mesh, A_loc: np.ndarray,
                                cell_agg_prev: np.ndarray,
                                R_prev_local: sp.csr_matrix,
                                A_coarse_prev: sp.csr_matrix,
                                boundary_dofs: np.ndarray,
                                n_ev: int, block_dims) -> tuple:
    """One more AMGe level.

    cell_agg_prev : (n_cells,) previous-level agglomerate id per fine cell
    R_prev_local  : previous composed restriction (n_prev_coarse, n_fine)
    A_coarse_prev : previous Galerkin operator (n_prev_coarse square)
    Returns (R_l (n_new_coarse, n_prev_coarse) csr, cell_agg_new).
    """
    from mfmg_tpu import native

    super_of_agg = group_agglomerates(mesh, cell_agg_prev, block_dims)
    cell_super = super_of_agg[cell_agg_prev]
    n_super = int(super_of_agg.max()) + 1
    coarse_diag = np.asarray(A_coarse_prev.diagonal())
    n_loc = mesh.n_loc

    rows, cols, vals = [], [], []
    R_prev_csr = R_prev_local.tocsr()
    R_prev_csc = R_prev_local.tocsc()
    for G in range(n_super):
        cells_G = np.nonzero(cell_super == G)[0]
        dofs = mesh.cells[cells_G]
        uniq, inv = np.unique(dofs, return_inverse=True)
        m = len(uniq)
        local = inv.reshape(dofs.shape)
        # Neumann patch assembly (native kernel or numpy fallback)
        A_G = native.assemble_patch(cells_G, local, A_loc, m)
        if A_G is None:
            A_G = np.zeros((m, m))
            r = np.broadcast_to(local[:, :, None], (len(cells_G), n_loc, n_loc))
            c = np.broadcast_to(local[:, None, :], (len(cells_G), n_loc, n_loc))
            np.add.at(A_G, (r.reshape(-1), c.reshape(-1)), A_loc[cells_G].reshape(-1))
        # Dirichlet elimination on the patch (raw diag kept)
        con = boundary_dofs[uniq]
        dG = np.diag(A_G).copy()
        keep = ~con
        A_G *= keep[:, None] * keep[None, :]
        A_G[np.diag_indices(m)] = np.where(con, dG, np.diag(A_G))

        # ALL previous-level coarse dofs whose support touches G's dofs —
        # members plus the boundary ring, exactly like shared nodes at level
        # 0 (without the ring the partition of unity breaks at super-agg
        # boundaries and multilevel rates collapse).
        member_rows = np.unique(R_prev_csc[:, uniq].tocoo().row)
        Rl = R_prev_csr[member_rows][:, uniq].toarray()       # (m1, m)
        m1 = Rl.shape[0]
        diag1 = np.einsum("im,mn,in->i", Rl, A_G, Rl)          # diag(Rl A_G Rl^T)
        # The local coarse basis (rows of Rl) is neither orthonormal nor even
        # independent (overlapping PoU rows can be exactly dependent), so the
        # generalized pencil (Rl A_G Rl^T, Rl Rl^T) is degenerate and its
        # regularized bottom spectrum is spurious.  Solve instead in the
        # orthonormalized ROW SPACE via SVD: with Rl = U S V^T (rank r),
        # eigensolve W^T A_G W for W = V_r, then map back with the
        # pseudoinverse coefficients c_j = U_r S_r^{-1} y_j.
        U, S, Vt = np.linalg.svd(Rl, full_matrices=False)
        r = int(np.sum(S > 1e-10 * S[0]))
        W = Vt[:r].T                                           # (m, r) orthonormal
        A_red = W.T @ A_G @ W
        A_red = 0.5 * (A_red + A_red.T)
        w_, y_ = np.linalg.eigh(A_red)
        kk = min(n_ev, r)
        w_pou = diag1 / coarse_diag[member_rows]
        for j in range(kk):
            c_j = U[:, :r] @ (y_[:, j] / S[:r])
            rows.append(np.full(m1, G * n_ev + j))
            cols.append(member_rows)
            vals.append(w_pou * c_j)

    R_l = sp.csr_matrix((np.concatenate(vals),
                         (np.concatenate(rows), np.concatenate(cols))),
                        shape=(n_super * n_ev, A_coarse_prev.shape[0]))
    nonzero = np.diff(R_l.indptr) > 0
    return R_l[nonzero], cell_super
