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


def test_metis_multilevel_partitioner():
    """True multilevel KL/FM partitioner (partitioner='metis'): balanced
    parts and a coarse space at least as good as the reference's Zoltan
    golden (test_hierarchy.cc:438, rate 0.836618927 with 4 agglomerates)."""
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate

    prob = LaplaceProblem.hyper_cube(2, 5)
    cfg = Config(is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(partitioner="metis",
                                                   n_agglomerates=4))
    ids = build_agglomerates(prob.mesh, cfg.agglomeration)
    sizes = np.bincount(ids)
    assert len(sizes) == 4
    assert sizes.min() > 0.6 * sizes.mean(), sizes
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert rate <= 0.836618927 + 1e-3, rate
