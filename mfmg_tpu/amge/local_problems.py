"""Per-agglomerate local operators as one padded dense batch.

The reference builds a sub-triangulation + sparse matrix per agglomerate and
eigensolves them one at a time under WorkStream threading
(dealii/amge_host.templates.hpp:586-615) or sequentially on GPU
(cuda/amge_device.templates.cuh:208-432, with a TODO to batch).  The
TPU-native design *is* that TODO: all agglomerate operators are materialized
as a single (n_agg, m_max, m_max) padded dense batch so the eigensolve runs as
one batched `eigh`/Lanczos — ragged sizes handled by masking, threads replaced
by the batch dimension.

Boundary conditions per agglomerate mirror the reference
(tests/test_hierarchy_helpers.hpp:253-259): Dirichlet is applied only where
the agglomerate touches the global Dirichlet boundary; interior agglomerate
boundaries are natural (Neumann).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mfmg_tpu.fem.mesh import Mesh


@dataclasses.dataclass
class AgglomerateBatch:
    """Padded batch of local problems.

    dof_map : (n_agg, m_max) int64 global dof ids, -1 padding
    valid   : (n_agg, m_max) bool
    A_agg   : (n_agg, m_max, m_max) Dirichlet-eliminated local matrices
              (raw diagonal kept at constrained dofs); padded diagonal 1
    diag    : (n_agg, m_max) local raw diagonals (the PoU numerators)
    constrained : (n_agg, m_max) bool
    sizes   : (n_agg,) int
    """

    dof_map: np.ndarray
    valid: np.ndarray
    A_agg: np.ndarray
    diag: np.ndarray
    constrained: np.ndarray
    sizes: np.ndarray

    @property
    def n_agg(self) -> int:
        return self.dof_map.shape[0]

    @property
    def m_max(self) -> int:
        return self.dof_map.shape[1]


def build_agglomerate_batch(mesh: Mesh, A_loc: np.ndarray, agg_ids: np.ndarray) -> AgglomerateBatch:
    """Assemble local dense operators for every agglomerate.

    A_loc: (n_cells, n_loc, n_loc) cell stiffness matrices (raw / Neumann).
    """
    n_agg = int(agg_ids.max()) + 1
    n_loc = mesh.n_loc

    # Group cells by agglomerate.
    order = np.argsort(agg_ids, kind="stable")
    cells_sorted = order
    counts = np.bincount(agg_ids, minlength=n_agg)
    offsets = np.concatenate([[0], np.cumsum(counts)])

    dof_maps = []
    sizes = np.empty(n_agg, dtype=np.int64)
    local_cells = []       # per agg: (n_agg_cells, n_loc) local dof indices
    for g in range(n_agg):
        cs = cells_sorted[offsets[g]: offsets[g + 1]]
        dofs = mesh.cells[cs]                              # (k, n_loc)
        uniq, inv = np.unique(dofs, return_inverse=True)
        dof_maps.append(uniq)
        sizes[g] = len(uniq)
        local_cells.append(inv.reshape(dofs.shape))

    m_max = int(sizes.max())
    dof_map = -np.ones((n_agg, m_max), dtype=np.int64)
    valid = np.zeros((n_agg, m_max), dtype=bool)
    A_agg = np.zeros((n_agg, m_max, m_max))
    for g in range(n_agg):
        m = sizes[g]
        dof_map[g, :m] = dof_maps[g]
        valid[g, :m] = True
        cs = cells_sorted[offsets[g]: offsets[g + 1]]
        li = local_cells[g]                                # (k, n_loc)
        rows = np.broadcast_to(li[:, :, None], (len(cs), n_loc, n_loc))
        cols = np.broadcast_to(li[:, None, :], (len(cs), n_loc, n_loc))
        np.add.at(A_agg[g], (rows.reshape(-1), cols.reshape(-1)), A_loc[cs].reshape(-1))

    diag = np.einsum("gii->gi", A_agg).copy()              # raw local diagonals
    constrained = np.zeros((n_agg, m_max), dtype=bool)
    constrained[valid] = mesh.boundary_dofs[dof_map[valid]]

    # Dirichlet elimination inside each agglomerate: zero constrained rows and
    # columns, restore the raw diagonal entry (see ops.sparse.eliminate_dirichlet
    # for why raw is kept).
    keep = ~constrained
    A_agg *= keep[:, :, None] * keep[:, None, :]
    gi, ii = np.nonzero(constrained)
    A_agg[gi, ii, ii] = diag[gi, ii]
    # Unit diagonal on padding so padded eigenpairs are decoupled and harmless.
    gi, ii = np.nonzero(~valid)
    A_agg[gi, ii, ii] = 1.0

    return AgglomerateBatch(dof_map=dof_map, valid=valid, A_agg=A_agg,
                            diag=diag, constrained=constrained, sizes=sizes)
