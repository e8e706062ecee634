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

When the previous level's AgglomerateBatch is available (level 1: the dense
local operators were already assembled for the level-0 eigensolve), the patch
Galerkin blocks come from ONE batched matmul per previous agglomerate,
K_a = Rb_a A_a Rb_a^T over the ~t_max coarse rows touching agglomerate a,
instead of per-cell blocks — 64x fewer index operations and BLAS-3 compute.
The math is identical: assembly is additive over cells, and an agglomerate's
local operator is exactly the sum of its cells' local matrices.
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


# Gram rank cutoffs (relative).  The truncation is a QUALITY knob, not just a
# numerical guard: near-dependent Gram directions carry little M-mass but can
# have large A-energy, and keeping them lets the local eigensolver pick
# noise-dominated functions that pollute the coarse space.  Measured at the
# bench config (65^3, 4x4x4 aggs, 3 levels): rank kept too high (tol 1e-14 or
# pstrf@1e-10) gives V-cycle rate 0.885 / PCG 17; the truncated basis gives
# 0.671 / PCG ~10 — this was the round-2 bench regression.
#
# pstrf pivots scale like EIGENVALUES of the scaled Gram (squared basis
# magnitudes), but dpstrf's internal stop rule is conservative, so its
# tolerance must sit ~2 decades looser than the eigh cutoff to truncate the
# same subspace: 1e-6 (pstrf) reproduces the eigh@1e-8 rate exactly.
#
# _USE_PSTRF selects the pivoted-Cholesky pencil reduction (with Jacobi
# pre-scaling for conditioning) — faster than the eigendecomposition basis at
# large batch; eigh remains the fallback on any pstrf failure.
_RANK_TOL = 1e-8      # eigh basis: keep lam > tol * lam_max
_PSTRF_TOL = 1e-6     # dpstrf pivot tolerance (see above)
_USE_PSTRF = True


def build_recursive_restriction(mesh: Mesh, A_loc: np.ndarray,
                                cell_agg_prev: np.ndarray,
                                R_prev_local: sp.csr_matrix,
                                A_coarse_prev: sp.csr_matrix,
                                boundary_dofs: np.ndarray,
                                n_ev: int, block_dims,
                                prev_batch=None, prev_blocks=None,
                                local_space: str = "overlap",
                                super_range=None) -> tuple:
    """One more AMGe level; returns (R_l csr over previous coarse, cell_super,
    super_grid).

    Dirichlet handling: constrained fine dofs are eliminated from the patch
    operator and the Gram (their R-row values zeroed), mirroring the level-0
    elimination.

    prev_batch: the previous level's AgglomerateBatch, if available — enables
    the per-agglomerate BLAS-3 block path (see module docstring).

    super_range: optional (s_lo, s_hi) DISTRIBUTED-SETUP slab — build only
    these supers' restriction rows.  prev_batch/prev_blocks must then be the
    slab batch covering exactly the member agglomerates of [s_lo, s_hi)
    (parallel/dist_setup.py aligns the level-0 slabs to super boundaries).
    The returned R_l has (s_hi - s_lo) * n_ev LOCAL rows (no empty-row
    dropping — the caller offsets by s_lo * n_ev, allgathers and drops);
    everything per super is computed exactly as in the replicated build
    (assembly is additive over MEMBER agglomerates, all of which are in the
    slab) — the analog of the reference's every-level MPI distribution
    (amge.templates.hpp:596-643).
    """
    super_of_agg, super_grid = group_agglomerates(mesh, cell_agg_prev, block_dims)
    cell_super = super_of_agg[cell_agg_prev]
    n_super = int(cell_super.max()) + 1
    n_rows_prev = A_coarse_prev.shape[0]
    coarse_diag = np.asarray(A_coarse_prev.diagonal())

    R = R_prev_local.tocsr()
    dof_rows, dof_vals = _dof_row_structure(R)

    if super_range is not None:
        s_lo, s_hi = super_range
        agg_sel = np.nonzero((super_of_agg >= s_lo) & (super_of_agg < s_hi))[0]
        if prev_batch is None or prev_batch.n_agg != len(agg_sel):
            raise ValueError("super_range needs the matching slab batch")
        G_local = super_of_agg[agg_sel] - s_lo
        A1, M, m1s, member_pad = _super_blocks_per_agg(
            prev_batch, G_local, dof_rows, dof_vals, n_rows_prev,
            s_hi - s_lo, blocks=prev_blocks)
        R_l = _solve_and_assemble(A1, M, m1s, member_pad, coarse_diag, n_ev,
                                  n_rows_prev, s_hi - s_lo, drop_empty=False)
        return R_l, cell_super, super_grid

    interior = False
    if prev_batch is not None and prev_batch.n_agg == len(super_of_agg):
        row_super = None
        if local_space == "interior" and n_rows_prev % prev_batch.n_agg == 0:
            # level-0 rows are agglomerate-major (build_restriction): row
            # r belongs to agglomerate r // n_ev, hence to that agg's super.
            n_ev_prev = n_rows_prev // prev_batch.n_agg
            row_super = super_of_agg[np.arange(n_rows_prev) // n_ev_prev]
            interior = True
        A1, M, m1s, member_pad = _super_blocks_per_agg(
            prev_batch, super_of_agg, dof_rows, dof_vals, n_rows_prev, n_super,
            row_super=row_super, blocks=prev_blocks)
    else:
        A1, M, m1s, member_pad = _super_blocks_per_cell(
            mesh, A_loc, cell_super, dof_rows, dof_vals, boundary_dofs,
            n_rows_prev, n_super)

    R_l = _solve_and_assemble(A1, M, m1s, member_pad, coarse_diag, n_ev,
                              n_rows_prev, n_super, unit_weights=interior)
    return R_l, cell_super, super_grid


def _super_blocks_per_cell(mesh: Mesh, A_loc: np.ndarray,
                           cell_super: np.ndarray,
                           dof_rows: np.ndarray, dof_vals: np.ndarray,
                           boundary_dofs: np.ndarray,
                           n_rows_prev: int, n_super: int):
    """Per-super (A1, Gram) padded batches assembled from per-CELL blocks."""
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
    return A1, M, m1s, member_pad


class AggBlocks:
    """Per-agglomerate dense R / Galerkin blocks (shared by the global
    Galerkin product and the recursive level's patch assembly).

    arows : (n_agg, t_max) coarse rows touching each agglomerate (padded)
    t_s   : (n_agg,) valid row counts
    Rb    : (n_agg, t_max, m) dense blocks of R restricted to rows x agg dofs
    K     : (n_agg, t_max, t_max) Galerkin blocks  Rb A_agg Rb^T
    """

    __slots__ = ("arows", "t_s", "Rb", "K")

    def __init__(self, arows, t_s, Rb, K):
        self.arows, self.t_s, self.Rb, self.K = arows, t_s, Rb, K


def agg_galerkin_blocks(batch, dof_rows: np.ndarray, dof_vals: np.ndarray,
                        n_rows: int, eliminate: bool = True) -> AggBlocks:
    """Batched per-agglomerate Galerkin blocks K_a = Rb_a A_a Rb_a^T.

    Assembly is additive over cells and every cell belongs to exactly one
    agglomerate, so scattering the K_a reproduces R A R^T exactly (the
    agglomerate-local A_agg carry the same Dirichlet elimination as the
    global matrix: zeroed rows/cols, raw diagonal kept).

    eliminate: additionally zero R values at constrained dofs inside the
    blocks (the recursive level's local-eigenproblem convention).
    """
    n_agg, m = batch.dof_map.shape
    dm = np.where(batch.valid, batch.dof_map, 0)
    keep = batch.valid & ~batch.constrained if eliminate else batch.valid

    from mfmg_tpu import native
    nat = native.agg_row_blocks(dm, batch.valid, keep, dof_rows, dof_vals)
    if nat is not None:
        arows, t_s, Rb = nat
        t_max = arows.shape[1]
    else:
        # numpy fallback: global-key unique + searchsorted positions
        ar = np.where(batch.valid[:, :, None], dof_rows[dm], -1)  # (n_agg,m,q)
        av = np.where(keep[:, :, None], dof_vals[dm], 0.0)
        ok = ar >= 0
        keys = np.where(ok, np.arange(n_agg, dtype=np.int64)[:, None, None]
                        * n_rows + ar, -1)
        agg_keys = np.unique(keys[ok])                     # agg-major sorted
        key_agg = agg_keys // n_rows
        t_s = np.bincount(key_agg, minlength=n_agg)
        offs_a = np.concatenate([[0], np.cumsum(t_s)])
        t_max = int(t_s.max()) if n_agg else 0
        arows = np.zeros((n_agg, t_max), dtype=np.int64)
        within = np.arange(len(agg_keys)) - offs_a[key_agg]
        arows[key_agg, within] = agg_keys % n_rows
        # dense per-agg R blocks ((row, dof) pairs are unique -> assignment)
        pos = np.searchsorted(agg_keys, np.where(ok, keys, 0)) - offs_a[
            np.arange(n_agg)[:, None, None]]
        ai = np.broadcast_to(np.arange(n_agg)[:, None, None], ar.shape)
        si = np.broadcast_to(np.arange(m)[None, :, None], ar.shape)
        Rb = np.zeros((n_agg, t_max, m))
        Rb[ai[ok], pos[ok], si[ok]] = av[ok]

    # K in the batch's dtype (float32 batches halve the BLAS-3 time; the
    # Gram/rank-cutoff stage stays float64 via Rb)
    kdt = batch.A_agg.dtype
    K = np.empty((n_agg, t_max, t_max), dtype=kdt)

    def _blk(lo, hi):
        Rb_c = Rb[lo:hi].astype(kdt, copy=False)
        tmp = np.matmul(Rb_c, batch.A_agg[lo:hi])
        np.matmul(tmp, np.swapaxes(Rb_c, 1, 2), out=K[lo:hi])

    _run_threaded(_blk, n_agg)
    return AggBlocks(arows, t_s, Rb, K)


def galerkin_product_from_blocks(blocks: AggBlocks, n_rows: int) -> sp.csr_matrix:
    """A_coarse = R A R^T assembled from the per-agglomerate Galerkin blocks
    — replaces both fast_multiply_transpose and the R·AP SpGEMM in the
    hierarchy's matrix-free setup (the global fine matrix never exists)."""
    t_max = blocks.arows.shape[1]
    valid = np.arange(t_max)[None] < blocks.t_s[:, None]    # (n_agg, t_max)
    vij = valid[:, :, None] & valid[:, None, :]
    ri = np.broadcast_to(blocks.arows[:, :, None], blocks.K.shape)[vij]
    cj = np.broadcast_to(blocks.arows[:, None, :], blocks.K.shape)[vij]
    A = sp.csr_matrix((blocks.K[vij], (ri, cj)), shape=(n_rows, n_rows))
    A.sum_duplicates()
    # Padded patch-row pairs that share no cell produce exact structural
    # zeros; drop them so the pattern matches a true SpGEMM R·A·Rᵀ (and the
    # coarse graph stays within the block-stencil ±1 window).
    A.eliminate_zeros()
    return A


def _super_blocks_per_agg(batch, super_of_agg: np.ndarray,
                          dof_rows: np.ndarray, dof_vals: np.ndarray,
                          n_rows_prev: int, n_super: int,
                          row_super=None, blocks: AggBlocks | None = None):
    """Per-super (A1, Gram) batches from per-AGGLOMERATE dense blocks.

    For each previous agglomerate a: Rb_a = the (t_a, m_a) dense block of R
    restricted to rows touching a x a's local dofs; then
      K_a = Rb_a A_a Rb_a^T      (batched BLAS-3 over all agglomerates)
      M_a = Rown_a Rown_a^T      (Rown = Rb masked to dofs OWNED by a within
                                  its super, so every dof of a super counts
                                  exactly once in the super's Gram)
    and both scatter into the padded per-super batches.  Exact: assembly is
    additive over cells and a's local operator is the sum over its cells.

    blocks: precomputed AggBlocks (shared with the global Galerkin product).
    """
    if blocks is None:
        blocks = agg_galerkin_blocks(batch, dof_rows, dof_vals, n_rows_prev)
    arows, t_s, Rb, K = blocks.arows, blocks.t_s, blocks.Rb, blocks.K
    n_agg, m = batch.dof_map.shape
    t_max = arows.shape[1]
    dm = np.where(batch.valid, batch.dof_map, 0)

    # ---- ownership: one owner agglomerate per (super, dof) ---------------
    G_of = super_of_agg.astype(np.int64)
    dkeys = np.where(batch.valid, G_of[:, None] * np.int64(dm.max() + 1) + dm, -1)
    flatd = dkeys.ravel()
    order = np.argsort(flatd, kind="stable")
    sortd = flatd[order]
    first = np.concatenate([[True], sortd[1:] != sortd[:-1]]) & (sortd >= 0)
    own = np.zeros(n_agg * m, dtype=bool)
    own[order[first]] = True
    own2 = own.reshape(n_agg, m)

    # ---- batched BLAS-3 Gram blocks, threaded over agglomerate chunks ----
    # Work in the Galerkin blocks' dtype (float32 for float32 hierarchies):
    # the ownership mask is fused into each chunk so the (n_agg, t_max, m)
    # masked copy never materializes globally (measured 13.7s for the f64
    # broadcast alone at 2.1M dofs vs 5.2s for the whole fused f32 pass).
    # The per-super pencil solves downstream stay float64.
    wdt = K.dtype if hasattr(K, "dtype") else np.float64
    Mb = np.empty((n_agg, t_max, t_max), dtype=wdt)

    def _blk(lo, hi):
        Rm = Rb[lo:hi].astype(wdt, copy=False) * own2[lo:hi][:, None, :]
        np.matmul(Rm, np.swapaxes(Rm, 1, 2), out=Mb[lo:hi])

    _run_threaded(_blk, n_agg)

    # ---- member-row table per super + scatter -----------------------------
    skeys = np.where(np.arange(t_max)[None] < t_s[:, None],
                     G_of[:, None] * n_rows_prev + arows, -1)
    if row_super is not None:
        # interior-only local spaces: a super's member rows are exactly the
        # rows it OWNS (the faithful recursive analog of level 0, where an
        # agglomerate's local dofs are the dofs of its own cells); rows owned
        # by neighbouring supers are dropped from the patch blocks.
        skeys = np.where((skeys >= 0) & (row_super[arows] == G_of[:, None]),
                         skeys, -1)
    member_keys = np.unique(skeys[skeys >= 0])
    key_super = member_keys // n_rows_prev
    m1s = np.bincount(key_super, minlength=n_super)
    offs = np.concatenate([[0], np.cumsum(m1s)])
    m1_max = int(m1s.max()) if n_super else 0
    member_pad = np.zeros((n_super, m1_max), dtype=np.int64)
    within = np.arange(len(member_keys)) - offs[key_super]
    member_pad[key_super, within] = member_keys % n_rows_prev

    m1p = m1_max + 1
    s_ok = skeys >= 0
    gpos = np.where(s_ok, np.searchsorted(member_keys, np.where(s_ok, skeys, 0))
                    - offs[G_of][:, None], m1_max)         # (n_agg, t_max)
    from mfmg_tpu import native
    nat = native.scatter_super_blocks(G_of, gpos, K, Mb, n_super, m1p)
    if nat is not None:
        A1, M = nat
    else:
        flat = (G_of[:, None, None] * m1p + gpos[:, :, None]) * m1p + gpos[:, None, :]
        A1 = _batched_scatter(flat, K, n_super * m1p * m1p).reshape(n_super, m1p, m1p)
        M = _batched_scatter(flat, Mb, n_super * m1p * m1p).reshape(n_super, m1p, m1p)
    A1 = A1[:, :m1_max, :m1_max]
    M = M[:, :m1_max, :m1_max]
    A1 = 0.5 * (A1 + np.swapaxes(A1, 1, 2))
    M = 0.5 * (M + np.swapaxes(M, 1, 2))
    return A1, M, m1s, member_pad


def _run_threaded(fn, n, min_per_worker=16):
    """Run fn(lo, hi) over [0, n) split across a thread pool.

    BLAS-internal threading is pinned to 1 inside the pool: the outer split
    already saturates the cores, and nested OpenBLAS threads oversubscribe
    badly on small hosts (2-core VM: run-to-run variance of 4x observed)."""
    import os
    n_workers = min(os.cpu_count() or 1, 8, max(1, n // min_per_worker))
    if n_workers <= 1:
        fn(0, n)
        return
    from mfmg_tpu.utils.threads import blas_single_thread
    bounds = np.linspace(0, n, n_workers + 1).astype(int)
    with blas_single_thread():
        with ThreadPoolExecutor(n_workers) as pool:
            for f in [pool.submit(fn, bounds[t], bounds[t + 1])
                      for t in range(n_workers)]:
                f.result()


def _solve_and_assemble(A1, M, m1s, member_pad, coarse_diag, n_ev,
                        n_rows_prev, n_super, unit_weights=False,
                        drop_empty=True):
    # ---- per-super rank-revealing eigensolves (threaded LAPACK) ----------
    # The degenerate pencil (A1, M) is reduced with a rank-revealing
    # M-orthonormal basis W (W^T M W = I restricted to range(M)), either by
    # eigendecomposition of M (default, see _USE_PSTRF) or pivoted Cholesky.
    import scipy.linalg as sla
    from scipy.linalg.lapack import dpstrf

    m1_max = member_pad.shape[1]

    diag1 = np.einsum("gii->gi", A1)
    cols_pad = np.zeros((n_super, n_ev, m1_max))
    kks = np.zeros(n_super, dtype=np.int64)

    def _reduce_pstrf(Ag, Mg, m1):
        # Jacobi-scale the pencil first (unit Gram diagonal): same
        # eigenfunctions, far better conditioned Cholesky basis.
        d = np.sqrt(np.maximum(Mg.diagonal(), 1e-300))
        Dg = 1.0 / d
        Ms = Mg * Dg[:, None] * Dg[None, :]
        c, piv, r, info = dpstrf(Ms, lower=1, tol=_PSTRF_TOL)
        if info < 0 or r == 0:
            return None
        piv = piv - 1                                  # LAPACK is 1-based
        L11 = np.tril(c[:r, :r])
        Ap = (Ag * Dg[:, None] * Dg[None, :])[np.ix_(piv, piv)]
        # A_red = L11^{-1} (Ap[:, :r] L11^{-T})[:r]  (= W^T A1 W)
        X = sla.solve_triangular(L11, Ap[:, :r].T, lower=True,
                                 check_finite=False).T
        A_red = sla.solve_triangular(L11, X[:r], lower=True,
                                     check_finite=False)
        A_red = 0.5 * (A_red + A_red.T)
        kk = min(n_ev, r)
        w_, y_ = sla.eigh(A_red, subset_by_index=[0, kk - 1],
                          driver="evr", check_finite=False)
        cr = sla.solve_triangular(L11, y_, lower=True, trans="T",
                                  check_finite=False)   # L11^{-T} y
        c_full = np.zeros((m1, kk))
        c_full[piv[:r]] = cr
        return kk, c_full * Dg[:, None]

    def _reduce_eigh(Ag, Mg, m1):
        lam, Q = np.linalg.eigh(Mg)
        r = int(np.sum(lam > _RANK_TOL * max(lam[-1], 1e-300)))
        if r == 0:
            return None
        W = Q[:, m1 - r:] / np.sqrt(lam[m1 - r:])
        A_red = W.T @ Ag @ W
        A_red = 0.5 * (A_red + A_red.T)
        kk = min(n_ev, r)
        w_, y_ = sla.eigh(A_red, subset_by_index=[0, kk - 1],
                          driver="evr", check_finite=False)
        return kk, W @ y_

    def _solve_range(lo, hi):
        for G in range(lo, hi):
            m1 = int(m1s[G])
            if m1 == 0:
                continue
            Ag, Mg = A1[G, :m1, :m1], M[G, :m1, :m1]
            out = None
            if _USE_PSTRF:
                try:
                    out = _reduce_pstrf(Ag, Mg, m1)
                except Exception:
                    out = None
            if out is None:
                out = _reduce_eigh(Ag, Mg, m1)
            if out is None:
                continue
            kk, c = out
            kks[G] = kk
            if unit_weights:
                cols_pad[G, :kk, :m1] = c.T
            else:
                w_pou = diag1[G, :m1] / coarse_diag[member_pad[G, :m1]]
                cols_pad[G, :kk, :m1] = (w_pou[:, None] * c).T

    _run_threaded(_solve_range, n_super, min_per_worker=2)

    # ---- assemble R_l from the padded per-super blocks -------------------
    gsel, jsel = np.nonzero(np.arange(n_ev)[None] < kks[:, None])
    rows_out = np.repeat(gsel * n_ev + jsel, m1s[gsel])
    mask = np.arange(m1_max)[None] < m1s[gsel][:, None]
    cols_out = member_pad[gsel][mask]
    vals_out = cols_pad[gsel, jsel][mask]
    R_l = sp.csr_matrix((vals_out, (rows_out, cols_out)),
                        shape=(n_super * n_ev, n_rows_prev))
    if not drop_empty:
        return R_l      # distributed slabs: keep row offsets stable
    nonzero = np.diff(R_l.indptr) > 0
    return R_l[nonzero]
