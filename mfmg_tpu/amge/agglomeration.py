"""Agglomerate partitioning of mesh cells.

Analog of AMGe::build_agglomerates (reference common/amge.templates.hpp:51-85):
  * "block": group nx x ny x nz neighboring cells per agglomerate — the
    reference's x->y->z walk (amge.templates.hpp:412-499).  On a structured
    grid this is a closed-form index computation instead of a mesh walk; the
    partition (which cells share an agglomerate) is identical, agglomerate
    *numbering* may differ from deal.II's Z-order iteration, which affects
    nothing downstream (restriction rows are permutation-invariant).
  * "metis"/"zoltan": graph partitioning of the cell-connectivity graph into
    n_agglomerates parts (amge.templates.hpp:501-594).  Implemented with a
    recursive coordinate-bisection partitioner (no external graph library on
    TPU hosts); produces balanced connected parts like Zoltan's RCB.
"""

from __future__ import annotations

import numpy as np

from mfmg_tpu.fem.mesh import Mesh


def build_agglomerates(mesh: Mesh, agg_cfg) -> np.ndarray:
    """Returns (n_cells,) agglomerate ids in [0, n_agg)."""
    if agg_cfg.partitioner == "block":
        return build_agglomerates_block(mesh, agg_cfg.block_dims(mesh.dim))
    if agg_cfg.partitioner in ("metis", "zoltan", "rcb"):
        return build_agglomerates_rcb(mesh, agg_cfg.n_agglomerates)
    raise ValueError(f"unknown partitioner {agg_cfg.partitioner!r}")


def build_agglomerates_block(mesh: Mesh, block_dims) -> np.ndarray:
    if mesh.is_structured:
        nc = mesh.structured_shape
        mi = mesh.cell_multi_index()                     # (n_cells, dim)
        agg_mi = np.empty_like(mi)
        n_agg_per_dim = []
        for d in range(mesh.dim):
            agg_mi[:, d] = mi[:, d] // block_dims[d]
            n_agg_per_dim.append(-(-nc[d] // block_dims[d]))
        agg = np.zeros(mesh.n_cells, dtype=np.int64)
        stride = 1
        for d in range(mesh.dim):
            agg += agg_mi[:, d] * stride
            stride *= n_agg_per_dim[d]
        return agg
    # Unstructured block walk: greedy growth along neighbor directions — the
    # direct analog of the reference's walk.  Uses cell centroids to define
    # the +x/+y/+z neighbor relation.
    return _block_walk_unstructured(mesh, block_dims)


def _cell_centroids(mesh: Mesh) -> np.ndarray:
    return mesh.nodes[mesh.cells].mean(axis=1)


def _block_walk_unstructured(mesh: Mesh, block_dims) -> np.ndarray:
    # Build face-neighbor relation from shared dofs (two cells are neighbors
    # if they share a full face worth of nodes).
    centroids = _cell_centroids(mesh)
    n_cells = mesh.n_cells
    dim = mesh.dim
    n_face_nodes = (mesh.degree + 1) ** (dim - 1)
    # Map from sorted dof-tuples per face is expensive; use shared-node counts.
    from collections import defaultdict
    node_to_cells = defaultdict(list)
    for c in range(n_cells):
        for d in np.unique(mesh.cells[c]):
            node_to_cells[int(d)].append(c)
    shared = defaultdict(int)
    for cs in node_to_cells.values():
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                shared[(cs[i], cs[j])] += 1
    neighbors = defaultdict(list)
    for (a, b), cnt in shared.items():
        if cnt >= n_face_nodes:
            neighbors[a].append(b)
            neighbors[b].append(a)

    def step(c, d):
        """Neighbor of cell c in +direction d, or -1."""
        best, best_dot = -1, 0.0
        for nb in neighbors[c]:
            v = centroids[nb] - centroids[c]
            nv = np.linalg.norm(v)
            if nv == 0:
                continue
            dot = v[d] / nv
            if dot > 0.7 and dot > best_dot:
                best, best_dot = nb, dot
        return best

    agg = -np.ones(n_cells, dtype=np.int64)
    current = 0
    d3 = block_dims[2] if dim == 3 else 1
    for c0 in range(n_cells):
        if agg[c0] >= 0:
            continue
        z_cell = c0
        for _k in range(d3):
            y_cell = z_cell
            for _j in range(block_dims[1]):
                cell = y_cell
                for _i in range(block_dims[0]):
                    agg[cell] = current
                    nxt = step(cell, 0)
                    if nxt < 0 or agg[nxt] >= 0:
                        break
                    cell = nxt
                nxt = step(y_cell, 1)
                if nxt < 0 or agg[nxt] >= 0:
                    break
                y_cell = nxt
            if dim == 3:
                nxt = step(z_cell, 2)
                if nxt < 0 or agg[nxt] >= 0:
                    break
                z_cell = nxt
        current += 1
    return agg


def build_agglomerates_rcb(mesh: Mesh, n_agglomerates: int) -> np.ndarray:
    """Recursive coordinate bisection into n_agglomerates balanced parts."""
    centroids = _cell_centroids(mesh)
    ids = np.arange(mesh.n_cells)
    parts = [(ids, n_agglomerates)]
    out = np.zeros(mesh.n_cells, dtype=np.int64)
    next_id = 0
    while parts:
        idx, k = parts.pop()
        if k <= 1:
            out[idx] = next_id
            next_id += 1
            continue
        pts = centroids[idx]
        spread = pts.max(axis=0) - pts.min(axis=0)
        d = int(np.argmax(spread))
        order = np.argsort(pts[:, d], kind="stable")
        k_left = k // 2
        split = int(round(len(idx) * k_left / k))
        parts.append((idx[order[:split]], k_left))
        parts.append((idx[order[split:]], k - k_left))
    return out
