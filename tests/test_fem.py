"""Discretization sanity tests.

Mirror of the reference's manufactured-solution and operator-equivalence
oracles (tests/test_laplace.cc:94-142, test_laplace_matrix_free.cc:97-135,
test_hierarchy.cc:647-695).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu.fem.laplace import LaplaceProblem
from mfmg_tpu.fem.mesh import hyper_cube
from mfmg_tpu.fem.reference import reference_element
from mfmg_tpu.ops.local_apply import mf_apply, mf_diagonal
from mfmg_tpu.solve.cg import cg_solve


def test_reference_element_partition_of_unity():
    for dim in (1, 2, 3):
        for k in (1, 2, 3):
            ref = reference_element(dim, k)
            # Shape functions sum to 1, gradients sum to 0 at every q-point.
            np.testing.assert_allclose(ref.N.sum(axis=1), 1.0, atol=1e-12)
            np.testing.assert_allclose(ref.D.sum(axis=2), 0.0, atol=1e-12)
            # Quadrature integrates constants exactly on [0,1]^dim.
            np.testing.assert_allclose(ref.qweights.sum(), 1.0, atol=1e-12)


def test_mesh_counts():
    mesh = hyper_cube(2, 3, degree=1)
    assert mesh.n_cells == 64
    assert mesh.n_nodes == 81
    assert mesh.boundary_dofs.sum() == 32
    mesh3 = hyper_cube(3, 2, degree=2)
    assert mesh3.n_cells == 64
    assert mesh3.n_nodes == 9**3


@pytest.mark.parametrize("dim", [2, 3])
def test_manufactured_quadratic_solution(dim):
    """Q2 elements reproduce a quadratic solution to machine precision
    (analog of test_laplace.cc: L2 error == 0 at tol 1e-14).

    u(x) = prod_d x_d(1-x_d) vanishes on the boundary of the unit cube;
    -Δu = f with f polynomial; Q2 FE space contains u exactly.
    """
    n_ref = 2 if dim == 3 else 3
    prob = LaplaceProblem.hyper_cube(dim, n_ref, degree=2, material_property="constant")

    def exact(p):
        u = np.ones(p.shape[:-1])
        for d in range(dim):
            u *= p[..., d] * (1.0 - p[..., d])
        return u

    def source(p):
        # f = -Δu = 2 * sum_d prod_{e != d} x_e(1-x_e)
        total = np.zeros(p.shape[:-1])
        for d in range(dim):
            term = np.full(p.shape[:-1], 2.0)
            for e in range(dim):
                if e != d:
                    term *= p[..., e] * (1.0 - p[..., e])
            total += term
        return total

    rhs = prob.assemble_rhs(source)
    A = prob.ell_operator()
    x, info = cg_solve(A, jnp.asarray(rhs), tol=1e-14, maxiter=2000)
    err = prob.l2_error(np.asarray(x), exact)
    assert err < 1e-10, f"L2 error {err}"


@pytest.mark.parametrize("material", ["constant", "linear", "linear_x", "discontinuous"])
def test_matrix_free_equals_assembled(material):
    """Matrix-free vmult ≡ assembled SpMV for all four coefficient families
    (analog of test_hierarchy.cc:647-695, tolerance 1e-9)."""
    prob = LaplaceProblem.hyper_cube(2, 3, degree=1, material_property=material)
    rng = np.random.default_rng(3)
    u = rng.uniform(0.0, 1.0, size=prob.n_dofs)
    u[prob.constrained] = 0.0
    u = jnp.asarray(u)

    y_ell = prob.ell_operator() @ u
    for mode in ("local_matrix", "quadrature"):
        y_mf = prob.matrix_free_operator(mode=mode) @ u
        np.testing.assert_allclose(np.asarray(y_mf), np.asarray(y_ell), atol=1e-9)


def test_matrix_free_diagonal():
    prob = LaplaceProblem.hyper_cube(2, 3, degree=1, material_property="linear")
    for mode in ("local_matrix", "quadrature"):
        mf = prob.matrix_free_operator(mode=mode)
        d = np.asarray(mf_diagonal(mf))
        d_ref = prob.A.diagonal()
        np.testing.assert_allclose(d, d_ref, atol=1e-10)


def test_distorted_mesh_still_valid():
    prob = LaplaceProblem.hyper_cube(2, 3, degree=1, distort_random=True)
    assert np.all(prob.geom.JxW > 0)
    # symmetry of assembled matrix
    diff = (prob.A - prob.A.T)
    assert abs(diff).max() < 1e-12


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (2, 3), (3, 1), (3, 2)])
def test_sumfac_equals_assembled(dim, degree):
    """Sum-factorized apply == assembled SpMV (oracle: the reference's MF ==
    matrix equivalence, tests/test_hierarchy.cc:647-695, at 1e-9)."""
    # distortion exercises the full (non-diagonal) metric; Q3's closely
    # spaced GLL nodes invert under the reference's 0.25*h random distortion,
    # so the highest degree runs undistorted
    prob = LaplaceProblem.hyper_cube(dim, 2, degree=degree,
                                     material_property="linear",
                                     distort_random=(degree < 3))
    op = prob.matrix_free_operator(mode="sumfac")
    rng = np.random.default_rng(3)
    x = rng.standard_normal(prob.n_dofs)
    y_mf = np.asarray(op @ jnp.asarray(x))
    # assembled reference: Dirichlet-eliminated matrix acts as identity*diag
    # on constrained dofs (ops.sparse.eliminate_dirichlet convention)
    y_sp = prob.A @ x
    np.testing.assert_allclose(y_mf, y_sp, rtol=0, atol=1e-9 * np.abs(y_sp).max())
    # diagonal matches assembled diagonal
    from mfmg_tpu.solve.operator import operator_diagonal
    d = np.asarray(operator_diagonal(op))
    np.testing.assert_allclose(d, prob.A.diagonal(), atol=1e-9)


def test_sumfac_hierarchy_golden_rate():
    """Q1 hierarchy with the sumfac operator reproduces the matrix-free
    chebyshev golden rate (test_hierarchy.cc:353: 0.0880045475)."""
    from mfmg_tpu import Config, Hierarchy
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(3, 2, material_property="constant")
    cfg = Config(operator="sumfac",
                 smoother=SmootherConfig(type="chebyshev", degree=1),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    h = Hierarchy(prob, cfg)
    rate = measure_vcycle_rate(h, n_cycles=20, seed=0)
    assert abs(rate - 0.0880045475) < 1e-2


def test_sumfac_high_order_hierarchy_converges():
    """Q3 2D sumfac-operator hierarchy: PCG converges fast (driver parity for
    fe_degree>1, hierarchy_driver.cc:216-283)."""
    from mfmg_tpu import Config, Hierarchy
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(2, 3, degree=3, material_property="linear")
    cfg = Config(operator="sumfac",
                 smoother=SmootherConfig(type="chebyshev", degree=3),
                 agglomeration=AgglomerationConfig(nx=2, ny=2))
    h = Hierarchy(prob, cfg)
    b = np.random.default_rng(0).uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x, info = h.solve_cg(b, tol=1e-8, maxiter=60)
    assert int(info["iterations"]) <= 25
    assert float(info["relres"]) < 1e-8
