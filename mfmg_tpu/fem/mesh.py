"""Meshes and DoF numbering.

Replaces the deal.II Triangulation/DoFHandler subset the reference tests use
(reference tests/laplace.hpp:88-152: hyper_cube/hyper_ball + refine_global +
boundary id 1 everywhere + optional distort_random).

A mesh is plain data: node coordinates, cell->dof connectivity, and a
Dirichlet-boundary dof mask.  DoFs are geometric Lagrange nodes (continuous
Q_k).  The structured hyper_cube path keeps its (cells-per-dim, degree)
metadata so downstream kernels can use the fast stencil/slab-sharded paths;
everything also works through the generic unstructured arrays.
"""

from __future__ import annotations

import dataclasses
import numpy as np

from mfmg_tpu.fem.reference import reference_element


@dataclasses.dataclass
class Mesh:
    dim: int
    degree: int
    nodes: np.ndarray            # (n_nodes, dim) float64
    cells: np.ndarray            # (n_cells, n_loc) int32 global dof ids, lexicographic local order
    boundary_dofs: np.ndarray    # (n_nodes,) bool — Dirichlet (boundary id 1) dofs
    # Structured metadata (None for unstructured meshes)
    structured_shape: tuple | None = None   # cells per dim, e.g. (4, 4, 4)
    # Hanging-node constraints for 1-irregular adaptive meshes (Q1 only);
    # None on conforming meshes.  See fem/adaptive.py.
    hanging: "HangingConstraints | None" = None
    # True after renumber_dofs: node ids are no longer lexicographic, so the
    # closed-form structured DOF paths (stencil extraction, vectorized batch
    # assembly, structured transfers) must not be used; cell-geometric
    # machinery (agglomeration) is unaffected
    dof_renumbered: bool = False

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def n_loc(self) -> int:
        return self.cells.shape[1]

    @property
    def is_structured(self) -> bool:
        return self.structured_shape is not None

    @property
    def constrained_mask(self) -> np.ndarray:
        """Dofs with constrained rows in the condensed system: Dirichlet plus
        hanging slaves.  The AMGe setup and solvers treat both identically
        (identity rows, untouched by the V-cycle); hanging values are
        recovered by ``LaplaceProblem.distribute`` after the solve."""
        if self.hanging is None:
            return self.boundary_dofs
        return self.boundary_dofs | self.hanging.slave_mask(self.n_nodes)

    def cell_multi_index(self) -> np.ndarray:
        """(n_cells, dim) integer cell coordinates for structured meshes."""
        assert self.is_structured
        shape = self.structured_shape
        idx = np.arange(self.n_cells)
        out = np.empty((self.n_cells, self.dim), dtype=np.int64)
        for d in range(self.dim):
            out[:, d] = idx % shape[d]
            idx = idx // shape[d]
        return out


def hyper_ball(dim: int, n_refinements: int, degree: int = 1,
               radius: float = 1.0,
               distort_random: bool = False, distort_factor: float = 0.1,
               seed: int = 0) -> Mesh:
    """Ball mesh à la dealii::GridGenerator::hyper_ball + refine_global
    (reference tests/laplace.hpp:92-93): 5 (2D) / 7 (3D) coarse cells refined
    with spherical projection of new boundary points."""
    from mfmg_tpu.fem.ball import boundary_vertex_mask, hyper_ball_base, refine_ball

    verts, cells_v = hyper_ball_base(dim, radius)
    for _ in range(n_refinements):
        verts, cells_v = refine_ball(verts, cells_v, radius)
    mesh = from_cell_complex(verts, cells_v, degree)
    if distort_random:
        # deal.II distort_random semantics (see structured_cube): exact-length
        # shift factor * (shortest adjacent edge) in a random direction.  The
        # per-vertex shortest adjacent edge is approximated by the cell-min
        # first-edge length over cells touching the vertex.
        rng = np.random.default_rng(seed)
        edge = np.linalg.norm(mesh.nodes[mesh.cells[:, 1]] - mesh.nodes[mesh.cells[:, 0]], axis=1)
        h_min = edge.min()
        shift = rng.uniform(-1.0, 1.0, size=mesh.nodes.shape)
        norm = np.linalg.norm(shift, axis=1, keepdims=True)
        shift *= distort_factor * h_min / np.where(norm > 0, norm, 1.0)
        mesh.nodes = mesh.nodes + (~mesh.boundary_dofs)[:, None] * shift
    return mesh


def from_cell_complex(verts: np.ndarray, cells_v: np.ndarray, degree: int = 1,
                      interior_faces: set | None = None) -> Mesh:
    """Build a Mesh (Q_degree dofs) from a vertex/hex-cell complex.

    Higher-order nodes are placed by the multilinear (MappingQ1-equivalent,
    deal.II's default) map of the cell vertices and deduplicated by
    coordinate hashing; Dirichlet dofs are the nodes on boundary faces (faces
    belonging to exactly one cell — all boundary gets id 1, laplace.hpp:100-108).

    interior_faces: sorted-vertex-tuple facets that are interior despite
    appearing in only one cell — the hanging interfaces of a 1-irregular
    adaptive complex (see fem/adaptive.py)."""
    from mfmg_tpu.fem.ball import _cell_faces
    from mfmg_tpu.fem.reference import reference_element

    dim = verts.shape[1]
    n_cells = len(cells_v)
    k = degree
    ref = reference_element(dim, k)

    if k == 1:
        nodes = np.asarray(verts, dtype=float)
        cells = np.asarray(cells_v, dtype=np.int32)
    else:
        # multilinear map of reference support points
        corners = verts[cells_v]                       # (c, 2^dim, dim)
        pts = ref.nodes                                # (n_loc, dim) in [0,1]^dim
        w = np.ones((ref.n_loc, 2 ** dim))
        for ci in range(2 ** dim):
            corner = [(ci >> d) & 1 for d in range(dim)]
            for d in range(dim):
                t = pts[:, d]
                w[:, ci] *= t if corner[d] else (1.0 - t)
        phys = np.einsum("lc,gcd->gld", w, corners)    # (c, n_loc, dim)
        flat = phys.reshape(-1, dim)
        key = np.round(flat / 1e-10).astype(np.int64)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        # representative coordinates
        nodes = np.zeros((len(uniq), dim))
        nodes[inv] = flat
        cells = inv.reshape(n_cells, ref.n_loc).astype(np.int32)

    # boundary faces -> boundary dofs
    from collections import Counter
    faces = _cell_faces(dim)
    count = Counter()
    for c in cells_v:
        for f in faces:
            count[tuple(sorted(int(c[i]) for i in f))] += 1
    boundary = np.zeros(len(nodes), dtype=bool)
    # local face-node sets of the Q_k cell (nodes with coord 0/1 along axis)
    lm = ref.local_multi_index
    face_nodes = []
    for d in range(dim):
        for side in (0, 1):
            face_nodes.append(np.nonzero(lm[:, d] == (0 if side == 0 else k))[0])
    skip = interior_faces or set()
    for ci, c in enumerate(cells_v):
        for fi, f in enumerate(faces):
            fv = tuple(sorted(int(c[i]) for i in f))
            if count[fv] == 1 and fv not in skip:
                boundary[cells[ci, face_nodes[fi]]] = True

    return Mesh(dim=dim, degree=k, nodes=np.asarray(nodes, dtype=float),
                cells=cells, boundary_dofs=boundary, structured_shape=None)


def hyper_cube(dim: int, n_refinements: int, degree: int = 1,
               distort_random: bool = False, distort_factor: float = 0.1,
               seed: int = 0) -> Mesh:
    """Unit cube [0,1]^dim refined n_refinements times (2^n cells per dim).

    Matches deal.II GridGenerator::hyper_cube + refine_global
    (reference tests/laplace.hpp:91-97).  All boundary faces get Dirichlet
    (boundary id 1, laplace.hpp:100-108).

    distort_random mimics dealii::GridTools::distort_random(0.1, tria)
    (laplace.hpp:110-111): every non-boundary node is moved by a uniformly
    random vector of length <= factor * (shortest adjacent edge).  The RNG
    differs from deal.II's, so distorted meshes are statistically, not
    bitwise, equivalent.
    """
    nc = 2 ** n_refinements
    return structured_cube(dim, (nc,) * dim, degree=degree,
                           distort_random=distort_random,
                           distort_factor=distort_factor, seed=seed)


def structured_cube(dim: int, cells_per_dim: tuple, degree: int = 1,
                    distort_random: bool = False, distort_factor: float = 0.1,
                    seed: int = 0,
                    lengths: tuple | None = None) -> Mesh:
    """Structured grid of cells_per_dim Q_degree cells on [0,L]^dim."""
    k = degree
    nc = tuple(int(c) for c in cells_per_dim)
    if lengths is None:
        lengths = (1.0,) * dim
    n1 = tuple(k * c + 1 for c in nc)          # nodes per dim
    # Node coordinates: tensor grid of GLL points mapped per cell.
    from mfmg_tpu.fem.reference import gauss_lobatto_points_1d

    ref = reference_element(dim, degree)
    gll = gauss_lobatto_points_1d(k)
    axes = []
    for d in range(dim):
        h = lengths[d] / nc[d]
        coords = np.empty(n1[d])
        for c in range(nc[d]):
            coords[c * k: (c + 1) * k + 1] = (c + gll) * h
        axes.append(coords)
    grids = np.meshgrid(*axes, indexing="ij")
    nodes = np.stack([g.flatten(order="F") for g in grids], axis=-1)

    # Cell connectivity, x fastest for both cells and local dofs.
    strides = np.cumprod((1,) + n1[:-1])       # node id strides per dim
    cell_strides = np.cumprod((1,) + nc[:-1])
    n_cells = int(np.prod(nc))
    cell_idx = np.arange(n_cells)
    cell_mi = np.empty((n_cells, dim), dtype=np.int64)
    tmp = cell_idx.copy()
    for d in range(dim):
        cell_mi[:, d] = tmp % nc[d]
        tmp //= nc[d]
    # local multi index from the reference element (x fastest)
    lm = ref.local_multi_index                  # (n_loc, dim)
    # global node id = sum_d (cell_mi[:,d]*k + lm[:,d]) * strides[d]
    cells = np.zeros((n_cells, ref.n_loc), dtype=np.int64)
    for d in range(dim):
        cells += (cell_mi[:, None, d] * k + lm[None, :, d]) * strides[d]

    # Dirichlet boundary: any coordinate index at 0 or n1-1.
    node_idx = np.arange(int(np.prod(n1)))
    boundary = np.zeros(len(node_idx), dtype=bool)
    tmp = node_idx.copy()
    for d in range(dim):
        md = tmp % n1[d]
        boundary |= (md == 0) | (md == n1[d] - 1)
        tmp //= n1[d]

    if distort_random:
        # deal.II GridTools::distort_random semantics: every interior vertex
        # moves by EXACTLY factor * (shortest adjacent edge) in a random
        # direction (uniform in [-1,1]^dim, then normalized).  The RNG stream
        # differs from deal.II's boost::mt19937, so distorted meshes are
        # statistically, not bitwise, equivalent.
        rng = np.random.default_rng(seed)
        h_min = min(lengths[d] / nc[d] for d in range(dim))
        shift = rng.uniform(-1.0, 1.0, size=nodes.shape)
        norm = np.linalg.norm(shift, axis=1, keepdims=True)
        shift *= distort_factor * h_min / np.where(norm > 0, norm, 1.0)
        movable = ~boundary
        nodes = nodes + movable[:, None] * shift

    return Mesh(dim=dim, degree=degree, nodes=nodes,
                cells=cells.astype(np.int32), boundary_dofs=boundary,
                structured_shape=nc)


def renumber_dofs(mesh: Mesh, method: str) -> Mesh:
    """Global DoF renumbering (analog of dealii::DoFRenumbering, consumed by
    the reference's test driver via laplace.reordering,
    reference tests/laplace.hpp:115-122).

    Supported: "reverse cuthill_mckee" / "reverse cuthill-mckee" (scipy
    csgraph RCM on the node-connectivity graph — deal.II's
    Cuthill_McKee(reversed_numbering=true)) and "king" (greedy wavefront-
    minimizing King ordering, the algorithm behind
    DoFRenumbering::boost::king_ordering; vertex visitation tie-breaks
    differ from boost's BGL internals, which is immaterial because the
    reference's golden table is numbering-INVARIANT,
    test_hierarchy.cc:282-307).  "none" returns the mesh unchanged.  The
    remaining boost orderings (reverse minimum degree, hierarchical) have no
    analog here; callers warn and fall back.
    """
    m = method.strip().lower().replace("-", "_").replace(" ", "_")
    if m in ("none", ""):
        return mesh
    if m not in ("reverse_cuthill_mckee", "reverse_cuthill_mckee_true", "rcm",
                 "king"):
        raise ValueError(f"unsupported reordering {method!r}")
    if mesh.hanging is not None:
        raise ValueError("renumbering of hanging-node meshes not supported")
    import scipy.sparse as sp

    n = mesh.n_nodes
    c = mesh.cells
    rows = np.repeat(c, c.shape[1], axis=1).reshape(-1)
    cols = np.tile(c, (1, c.shape[1])).reshape(-1)
    A = sp.csr_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n))
    if m == "king":
        p = _king_ordering(A)
    else:
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        p = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    q = np.empty(n, dtype=np.int64)
    q[p] = np.arange(n)
    return dataclasses.replace(
        mesh, nodes=mesh.nodes[p], cells=q[mesh.cells].astype(mesh.cells.dtype),
        boundary_dofs=mesh.boundary_dofs[p], dof_renumbered=True)


def _king_ordering(A) -> np.ndarray:
    """King ordering of a symmetric sparsity graph: breadth-first numbering
    that at each step picks the frontier vertex introducing the FEWEST new
    wavefront vertices (ties broken by discovery order, then degree).  This
    is the wavefront-minimizing criterion of King (1970), the algorithm
    boost::king_ordering implements; O(n * front * deg) host loop — setup-
    time only, used on the reference's small reordering-sweep meshes."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    indptr, indices = A.indptr, A.indices
    deg = np.diff(indptr)
    order = np.empty(n, dtype=np.int64)
    numbered = np.zeros(n, dtype=bool)
    in_front = np.zeros(n, dtype=bool)
    discovery = np.full(n, n, dtype=np.int64)
    front: list[int] = []
    k = 0
    while k < n:
        if not front:
            rest = np.nonzero(~numbered)[0]
            start = rest[np.argmin(deg[rest])]      # min-degree seed
            front = [int(start)]
            in_front[start] = True
            discovery[start] = k
        best, best_cost = None, None
        for v in front:
            nb = indices[indptr[v]: indptr[v + 1]]
            cost = int(np.count_nonzero(~numbered[nb] & ~in_front[nb]))
            key = (cost, discovery[v], deg[v])
            if best is None or key < best_cost:
                best, best_cost = v, key
        order[k] = best
        numbered[best] = True
        in_front[best] = False
        front.remove(best)
        nb = indices[indptr[best]: indptr[best + 1]]
        for w in nb[~numbered[nb] & ~in_front[nb]]:
            in_front[w] = True
            discovery[w] = k
            front.append(int(w))
        k += 1
    return order
