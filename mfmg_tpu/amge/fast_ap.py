"""fast_ap: matrix-free construction of AP = A·Rᵀ from per-agglomerate pieces.

Re-design of the reference's fast_multiply_transpose
(dealii_hierarchy_helpers.cc:56-303, boundary agglomerates from
common/amge.templates.hpp:87-151).  The identity (verified entrywise against
the naive SpGEMM at 1e-9, mirroring tests/test_hierarchy.cc:507-642):

    column (g,k) of A·Rᵀ  =  λ_gk·e  +  A_bl·Δe  +  A_halo·(Δe + e)

where e is agglomerate g's k-th eigenvector, Δe = (w-1)·e (nonzero only on
the agglomerate's geometric boundary where the PoU weight w != 1),
A_bl is assembled from the agglomerate's boundary-layer cells (cells with a
neighbor outside), and A_halo from the one-ring of outside cells touching the
agglomerate.

Where the reference runs a WorkStream thread loop with one patch matvec at a
time, here all boundary-layer patches (and then all halo patches) form padded
dense batches and the corrections are two batched matvecs on the MXU.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from mfmg_tpu.amge.local_problems import AgglomerateBatch
from mfmg_tpu.fem.mesh import Mesh


def cell_adjacency(mesh: Mesh):
    """Cells sharing at least one mesh node (deal.II vertex connectivity
    analog, GridTools::get_vertex_connectivity_of_cells)."""
    n_cells = mesh.n_cells
    # node -> cells incidence as a sparse matrix, then cell-cell via product
    n_loc = mesh.n_loc
    rows = np.repeat(np.arange(n_cells), n_loc)
    cols = mesh.cells.reshape(-1)
    inc = sp.csr_matrix((np.ones(len(rows), dtype=np.int8), (rows, cols)),
                        shape=(n_cells, mesh.n_nodes))
    adj = (inc @ inc.T).tocsr()
    return adj


def boundary_and_halo_patches(mesh: Mesh, agg_ids: np.ndarray):
    """Per agglomerate: (boundary-layer cells, halo cells)
    (amge.templates.hpp:116-148)."""
    adj = cell_adjacency(mesh)
    n_agg = int(agg_ids.max()) + 1
    interior, halo = [], []
    for g in range(n_agg):
        cells_g = np.nonzero(agg_ids == g)[0]
        in_g = np.zeros(mesh.n_cells, dtype=bool)
        in_g[cells_g] = True
        layer, halo_set = [], set()
        for c in cells_g:
            nbrs = adj.indices[adj.indptr[c]: adj.indptr[c + 1]]
            outside = nbrs[~in_g[nbrs]]
            if len(outside):
                layer.append(c)
                halo_set.update(outside.tolist())
        interior.append(np.array(layer, dtype=np.int64))
        halo.append(np.array(sorted(halo_set), dtype=np.int64))
    return interior, halo


def build_patch_batch(mesh: Mesh, A_loc: np.ndarray, cell_lists) -> AgglomerateBatch:
    """Padded dense batch of patch operators for explicit (possibly
    overlapping) cell lists — the generalization of build_agglomerate_batch
    used for the fast-AP boundary/halo patches."""
    n_patch = len(cell_lists)
    n_loc = mesh.n_loc
    dof_maps, local_cells, sizes = [], [], np.zeros(n_patch, dtype=np.int64)
    for p, cs in enumerate(cell_lists):
        if len(cs) == 0:
            dof_maps.append(np.empty(0, dtype=np.int64))
            local_cells.append(np.empty((0, n_loc), dtype=np.int64))
            continue
        dofs = mesh.cells[cs]
        uniq, inv = np.unique(dofs, return_inverse=True)
        dof_maps.append(uniq)
        sizes[p] = len(uniq)
        local_cells.append(inv.reshape(dofs.shape))

    m_max = int(max(sizes.max(), 1))
    dof_map = -np.ones((n_patch, m_max), dtype=np.int64)
    valid = np.zeros((n_patch, m_max), dtype=bool)
    A_agg = np.zeros((n_patch, m_max, m_max))
    for p, cs in enumerate(cell_lists):
        m = sizes[p]
        if m == 0:
            continue
        dof_map[p, :m] = dof_maps[p]
        valid[p, :m] = True
        li = local_cells[p]
        rows = np.broadcast_to(li[:, :, None], (len(cs), n_loc, n_loc))
        cols = np.broadcast_to(li[:, None, :], (len(cs), n_loc, n_loc))
        np.add.at(A_agg[p], (rows.reshape(-1), cols.reshape(-1)), A_loc[np.asarray(cs)].reshape(-1))

    diag = np.einsum("gii->gi", A_agg).copy()
    constrained = np.zeros((n_patch, m_max), dtype=bool)
    constrained[valid] = mesh.boundary_dofs[dof_map[valid]]
    keep = ~constrained
    A_agg *= keep[:, :, None] * keep[:, None, :]
    gi, ii = np.nonzero(constrained)
    A_agg[gi, ii, ii] = diag[gi, ii]
    gi, ii = np.nonzero(~valid)
    A_agg[gi, ii, ii] = 1.0
    return AgglomerateBatch(dof_map=dof_map, valid=valid, A_agg=A_agg,
                            diag=diag, constrained=constrained, sizes=sizes)


def fast_multiply_transpose(mesh: Mesh, A_loc: np.ndarray, agg_ids: np.ndarray,
                            batch: AgglomerateBatch, evals: np.ndarray,
                            evecs: np.ndarray, global_diag: np.ndarray) -> sp.csr_matrix:
    """Assemble AP = A·Rᵀ (shape n_dofs x n_coarse) without global SpGEMM."""
    import jax.numpy as jnp

    n_agg, m_max, n_ev = evecs.shape
    n_dofs = mesh.n_nodes
    w = np.where(batch.valid,
                 batch.diag / np.where(batch.dof_map >= 0, global_diag[batch.dof_map], 1.0),
                 0.0)
    delta = (w[:, :, None] - 1.0) * evecs          # Δe on agg-local layout
    full = delta + evecs                           # Δe + e

    # term 1: Λ·E (agg-local)
    rows_out, cols_out, vals_out = [], [], []
    gi, ii = np.nonzero(batch.valid)
    for k in range(n_ev):
        rows_out.append(batch.dof_map[gi, ii])
        cols_out.append(gi * n_ev + k)
        vals_out.append(evals[gi, k] * evecs[gi, ii, k])

    interior, halo = boundary_and_halo_patches(mesh, agg_ids)
    # map global dof values of (Δe or Δe+e) onto each patch's local layout
    # via a dense per-agg lookup: dof -> agg-local index
    dof_to_local = {}
    for g in range(n_agg):
        for i in range(batch.sizes[g]):
            dof_to_local[(g, batch.dof_map[g, i])] = i

    for cell_lists, vec_src in ((interior, delta), (halo, full)):
        pb = build_patch_batch(mesh, A_loc, cell_lists)
        n_patch, pm = pb.dof_map.shape
        # patch-local copies of the source vectors
        src = np.zeros((n_patch, pm, n_ev))
        for p in range(n_patch):
            for j in range(pb.sizes[p]):
                key = (p, pb.dof_map[p, j])
                if key in dof_to_local:
                    src[p, j, :] = vec_src[p, dof_to_local[key], :]
        # batched patch matvec on device (MXU)
        corr = np.asarray(jnp.einsum("pij,pjk->pik", jnp.asarray(pb.A_agg),
                                     jnp.asarray(src)))
        pi, jj = np.nonzero(pb.valid)
        for k in range(n_ev):
            rows_out.append(pb.dof_map[pi, jj])
            cols_out.append(pi * n_ev + k)
            vals_out.append(corr[pi, jj, k])

    rows = np.concatenate(rows_out)
    cols = np.concatenate(cols_out)
    vals = np.concatenate(vals_out)
    AP = sp.csr_matrix((vals, (rows, cols)), shape=(n_dofs, n_agg * n_ev))
    AP.sum_duplicates()
    return AP
