"""hyper_ball meshes: deal.II-compatible ball triangulations.

Reproduces dealii::GridGenerator::hyper_ball + refine_global as used by the
reference tests (tests/laplace.hpp:91-97): a coarse cell complex (5 cells in
2D, 7 in 3D) whose outer vertices lie on the sphere, refined uniformly with
new boundary points projected onto the sphere (SphericalManifold behaviour:
the new point on a boundary edge/face is the radius-normalized mean of its
parents) and interior points placed by plain averaging.

The base vertex layouts follow deal.II's documented construction: outer cube
vertices at radius r (scaled to r/sqrt(d)), inner cube scaled by
a = 1/(1+sqrt(2)) in 2D and the analogous 0.5527864 factor... in practice the
inner scaling only shifts mesh quality; deal.II uses:
  2D: inner square at radius a*r/sqrt(2) with a = 1/(1+sqrt 2)
  3D: inner cube at a*r/sqrt(3) with a = 1/(1+sqrt 3) (deal.II uses
      coefficient such that cells are balanced; we use the same form).
Rates on these meshes match the reference's ball goldens only approximately
(the tolerance of 1e-2 absorbs small geometric differences).
"""

from __future__ import annotations

import numpy as np


def hyper_ball_base(dim: int, radius: float = 1.0):
    """Vertices and cells of the unrefined ball mesh."""
    if dim == 2:
        b = radius / np.sqrt(2.0)
        # deal.II 2D hyper_ball: outer square corners on the circle at b,
        # inner square at b * 1/(1+sqrt(2)) (GridGenerator::hyper_ball)
        a = 1.0 / (1.0 + np.sqrt(2.0))
        inner = b * a * np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], dtype=float)
        outer = b * np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], dtype=float)
        verts = np.vstack([outer[0], outer[1], inner[0], inner[1],
                           inner[2], inner[3], outer[2], outer[3]])
        # quads with consistent (counterclockwise) orientation, lexicographic
        # local ordering (x fastest): (v00, v10, v01, v11)
        cells = np.array([
            [0, 1, 2, 3],     # bottom
            [2, 3, 4, 5],     # center
            [0, 2, 6, 4],     # left
            [3, 1, 5, 7],     # right
            [4, 5, 6, 7],     # top
        ])
        return verts, cells
    if dim == 3:
        b = radius / np.sqrt(3.0)
        # deal.II: inner cube at a = 1/(1+sqrt(3)) of the outer half-width
        # ("equilibrate cell sizes at transition from inner part to radial
        # cells", GridGenerator::hyper_ball<3>)
        ai = b / (1.0 + np.sqrt(3.0))
        corners = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)], dtype=float)
        verts = np.vstack([corners * ai, corners * b])   # 0-7 inner, 8-15 outer
        I, O = np.arange(8), np.arange(8, 16)
        # local lexicographic hex ordering: (x fastest, then y, then z)
        def hx(v000, v100, v010, v110, v001, v101, v011, v111):
            return [v000, v100, v010, v110, v001, v101, v011, v111]
        cells = np.array([
            hx(*I),                                                    # center
            hx(O[0], O[1], O[2], O[3], I[0], I[1], I[2], I[3]),        # bottom (z-)
            hx(I[4], I[5], I[6], I[7], O[4], O[5], O[6], O[7]),        # top (z+)
            hx(O[0], O[1], I[0], I[1], O[4], O[5], I[4], I[5]),        # front (y-)
            hx(I[2], I[3], O[2], O[3], I[6], I[7], O[6], O[7]),        # back (y+)
            hx(O[0], I[0], O[2], I[2], O[4], I[4], O[6], I[6]),        # left (x-)
            hx(I[1], O[1], I[3], O[3], I[5], O[5], I[7], O[7]),        # right (x+)
        ])
        return verts, cells
    raise ValueError("hyper_ball supports dim 2 and 3")


def _cell_faces(dim):
    """Local vertex index lists of the 2*dim faces of a cell (lexicographic
    vertex numbering, x fastest)."""
    n = 2 ** dim
    idx = np.arange(n)
    coords = [(idx >> d) & 1 for d in range(dim)]
    faces = []
    for d in range(dim):
        for side in (0, 1):
            faces.append(tuple(int(i) for i in idx[coords[d] == side]))
    return faces


def boundary_vertex_mask(verts, cells):
    """Vertices on boundary faces (faces appearing in exactly one cell)."""
    dim = verts.shape[1]
    from collections import Counter
    count = Counter()
    for c in cells:
        for f in _cell_faces(dim):
            count[tuple(sorted(c[list(f)]))] += 1
    mask = np.zeros(len(verts), dtype=bool)
    for face, k in count.items():
        if k == 1:
            mask[list(face)] = True
    return mask


def refine_ball(verts, cells, radius: float):
    """One uniform refinement with spherical projection of boundary points."""
    dim = verts.shape[1]
    bmask = boundary_vertex_mask(verts, cells)
    verts = list(map(np.asarray, verts))
    cache = {}

    def midpoint(vids):
        key = tuple(sorted(vids))
        if key in cache:
            return cache[key]
        pts = np.stack([verts[i] for i in vids])
        p = pts.mean(axis=0)
        if all(bmask[i] for i in vids):
            # SphericalManifold: radius-normalized mean direction
            p = p / np.linalg.norm(p) * radius
        idx = len(verts)
        verts.append(p)
        cache[key] = idx
        return idx

    new_cells = []
    for c in cells:
        # sub-vertex grid (3^dim) of the refined cell, lexicographic
        grid = {}
        for mi in np.ndindex(*(3,) * dim):
            # parent vertices involved: corners of the sub-box position
            lo = [m // 2 for m in mi]       # not used; use interpolation sets
            # position mi/2 in reference coords; contributing parent corners:
            contrib = []
            for corner in np.ndindex(*(2,) * dim):
                w = 1.0
                for d in range(dim):
                    t = mi[d] / 2.0
                    w *= (1.0 - t) if corner[d] == 0 else t
                if w > 1e-12:
                    contrib.append(c[sum(corner[d] << d for d in range(dim))])
            if len(contrib) == 1:
                grid[mi] = contrib[0]
            else:
                grid[mi] = midpoint(contrib)
        for si in range(2 ** dim):
            sub = tuple((si >> d) & 1 for d in range(dim))
            child = []
            for ci in range(2 ** dim):          # lexicographic: x = bit 0
                corner = tuple((ci >> d) & 1 for d in range(dim))
                mi = tuple(sub[d] + corner[d] for d in range(dim))
                child.append(grid[mi])
            new_cells.append(child)
    return np.asarray(verts), np.asarray(new_cells, dtype=np.int64)
