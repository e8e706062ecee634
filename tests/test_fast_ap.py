"""fast_ap oracle: the matrix-free AP construction equals the naive A·Rᵀ
entrywise (analog of tests/test_hierarchy.cc:507-642, tolerance 1e-9)."""

import numpy as np
import pytest

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.amge.fast_ap import boundary_and_halo_patches, fast_multiply_transpose
from mfmg_tpu.amge.local_problems import build_agglomerate_batch
from mfmg_tpu.amge.restriction import build_restriction
from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
from mfmg_tpu.config import AgglomerationConfig, EigensolverConfig, SmootherConfig
from mfmg_tpu.eigen.batched_eigh import batched_smallest_eigenpairs


@pytest.mark.parametrize("dim,n_ref,material,mode", [
    (2, 3, "constant", "pin"),
    (2, 4, "linear", "identity"),
    (3, 2, "constant", "pin"),
    (2, 4, "discontinuous", "identity"),
])
def test_fast_ap_equals_naive(dim, n_ref, material, mode):
    prob = LaplaceProblem.hyper_cube(dim, n_ref, material_property=material)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    evals, evecs = batched_smallest_eigenpairs(batch, 2, constrained_mode=mode)
    R = build_restriction(batch, evecs, prob.diag_raw, prob.n_dofs)
    AP_naive = (prob.A @ R.T).toarray()
    AP_fast = fast_multiply_transpose(prob.mesh, prob.A_loc, agg, batch,
                                      evals, evecs, prob.diag_raw).toarray()
    err = np.abs(AP_fast - AP_naive).max() / np.abs(AP_naive).max()
    assert err < 1e-9, err


def test_boundary_halo_patch_structure():
    """2x2-cell agglomerates on 4x4 cells: every agg cell is a boundary-layer
    cell; halo = the ring of outside vertex-neighbors."""
    prob = LaplaceProblem.hyper_cube(2, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2))
    interior, halo = boundary_and_halo_patches(prob.mesh, agg)
    assert len(interior) == len(halo) == 4
    for g in range(4):
        members = set(np.nonzero(agg == g)[0])
        # boundary layer: the 3 cells of each corner block that touch another
        # block (the domain-corner cell has no outside neighbor)
        assert set(interior[g]) <= members
        assert len(interior[g]) == 3
        assert len(halo[g]) == 5  # L-shaped ring of 5 cells around a corner block
        assert not set(halo[g]) & members


def test_hierarchy_fast_ap_same_rate():
    """Hierarchy built with fast_ap produces an identical coarse operator and
    hence the same golden rate."""
    prob = LaplaceProblem.hyper_cube(3, 2)
    base = dict(operator="matrix_free", is_preconditioner=False,
                eigensolver=EigensolverConfig(type="lapack", n_eigenvectors=2),
                smoother=SmootherConfig(type="chebyshev", degree=1),
                agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    h_slow = Hierarchy(prob, Config(fast_ap=False, **base))
    h_fast = Hierarchy(prob, Config(fast_ap=True, **base))
    Ac_slow = h_slow._A_per_level[1].toarray()
    Ac_fast = h_fast._A_per_level[1].toarray()
    np.testing.assert_allclose(Ac_fast, Ac_slow, atol=1e-11)
    r_slow = measure_vcycle_rate(h_slow, 20, seed=0)
    r_fast = measure_vcycle_rate(h_fast, 20, seed=0)
    assert r_fast == pytest.approx(r_slow, abs=1e-8)


def test_matrix_free_setup_never_assembles_global_matrix():
    """The matrix-free setup path (mf-style operator + fast AP) must never
    form the global CSR — the reference's matrix-free hierarchy does not
    either (dealii_matrix_free_hierarchy_helpers.cc:55-303).  Global A is a
    lazy property; asserting the caches stay empty proves no setup step
    touched it."""
    for operator in ("stencil", "matrix_free", "sumfac"):
        prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
        cfg = Config(operator=operator, max_levels=3,
                     smoother=SmootherConfig(type="chebyshev", degree=2),
                     agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
        h = Hierarchy(prob, cfg)
        assert prob._A is None and prob._A_raw is None, operator
        # and the hierarchy still solves
        b = np.random.default_rng(0).uniform(size=prob.n_dofs)
        b[prob.constrained] = 0.0
        x, info = h.solve_cg(b, tol=1e-8, maxiter=50)
        assert info["iterations"] <= 20, (operator, info)
        assert h.operator_complexity() > 1.0
