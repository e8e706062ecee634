"""deal.II ordering parity: literal agglomerate-id goldens + numbering props.

The reference pins exact per-cell agglomerate id vectors (in deal.II's
active-cell iteration order, ids seeded by the block walk)
(test_agglomerate.cc:69-288).  Round 1 could not reproduce them because our
cell numbering is lexicographic; fem/dealii_order.py provides the exact
deal.II Morton/tree orderings, making the literal goldens testable.

Golden data extracted verbatim from test_agglomerate.cc (serial,
world_size == 1): tests/data/agglomerate_goldens.json.
"""

import json
import os

import numpy as np
import pytest

from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.config import AgglomerationConfig
from mfmg_tpu.fem import mesh as fem_mesh
from mfmg_tpu.fem.dealii_order import dealii_cell_order, dealii_dof_numbering

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                      "agglomerate_goldens.json")))


@pytest.mark.parametrize("dim,key", [(2, "simple_2d"), (3, "simple_3d")])
def test_agglomerate_id_golden(dim, key):
    """Literal agglomerate ids (test_agglomerate.cc:79-117 2D, 130-160 3D):
    hyper_cube refine_global(3), block partitioner nx=2 ny=3 nz=4, serial."""
    mesh = fem_mesh.hyper_cube(dim, 3)
    cfg = AgglomerationConfig(partitioner="block_dealii", nx=2, ny=3, nz=4)
    agg = build_agglomerates(mesh, cfg)
    order = dealii_cell_order(mesh)
    ours_in_dealii_order = agg[order] + 1        # reference ids are 1-based
    np.testing.assert_array_equal(ours_in_dealii_order, GOLDENS[key])


def test_block_dealii_same_partition_as_block_when_dividing():
    """With evenly dividing block dims the walk and the closed-form block
    partition agree up to agglomerate renumbering."""
    mesh = fem_mesh.hyper_cube(2, 3)
    a = build_agglomerates(mesh, AgglomerationConfig(partitioner="block", nx=2, ny=2))
    b = build_agglomerates(mesh, AgglomerationConfig(partitioner="block_dealii", nx=2, ny=2))
    # same partition <=> each b-id maps to exactly one a-id and vice versa
    pairs = {(x, y) for x, y in zip(a, b)}
    assert len(pairs) == len(set(a)) == len(set(b))


def test_dealii_cell_order_is_morton():
    mesh = fem_mesh.hyper_cube(2, 2)
    order = dealii_cell_order(mesh)
    mi = mesh.cell_multi_index()[order]
    # first 4 cells = children of the first level-1 child: the 2x2 lower-left
    assert set(map(tuple, mi[:4])) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    assert tuple(mi[0]) == (0, 0) and tuple(mi[1]) == (1, 0)
    assert set(map(tuple, mi[4:8])) == {(2, 0), (3, 0), (2, 1), (3, 1)}


def test_dealii_dof_numbering_first_touch():
    mesh = fem_mesh.hyper_cube(3, 2)
    dealii_of = dealii_dof_numbering(mesh)
    assert np.array_equal(np.sort(dealii_of), np.arange(mesh.n_nodes))
    # first cell in deal.II order owns dofs 0..7 (first-touch, vertex order)
    order = dealii_cell_order(mesh)
    first_cell_dofs = dealii_of[mesh.cells[order[0]]]
    assert np.array_equal(first_cell_dofs, np.arange(8))


def test_dealii_numbering_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        dealii_dof_numbering(fem_mesh.hyper_cube(2, 2, degree=2))
    with pytest.raises(ValueError):
        dealii_cell_order(fem_mesh.structured_cube(2, (3, 3)))
