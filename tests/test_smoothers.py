"""Smoother unit tests (analog of the reference's smoother coverage in
test_smoother_device.cu and the smoother usage across test_hierarchy.cc)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
from mfmg_tpu.ops.stencil import stencil_from_csr
from mfmg_tpu.solve.smoothers import (MulticolorGSSmoother, _color_operator,
                                      build_smoother)


def test_coloring_is_proper():
    """No two coupled dofs share a color (stencil + ELL paths)."""
    prob = LaplaceProblem.hyper_cube(2, 3)
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
    colors, n_colors = _color_operator(S)
    colors = np.asarray(colors)
    A = prob.A.tocoo()
    mask = (A.row != A.col) & (A.data != 0)
    assert not np.any(colors[A.row[mask]] == colors[A.col[mask]])
    assert n_colors == 4  # 2x2 lattice coloring for the 9-point Q1 stencil

    from mfmg_tpu.ops.sparse import ell_from_scipy
    E = ell_from_scipy(prob.A, dtype=jnp.float64)
    colors_e, n_e = _color_operator(E)
    colors_e = np.asarray(colors_e)
    assert not np.any(colors_e[A.row[mask]] == colors_e[A.col[mask]])


def test_gs_smoother_converges_as_solver():
    """x <- smooth(b, x) iterated alone must converge for SPD A (GS property)."""
    prob = LaplaceProblem.hyper_cube(2, 2)
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
    sm = build_smoother(S, SmootherConfig(type="symmetric gauss-seidel"), dtype=jnp.float64)
    assert isinstance(sm, MulticolorGSSmoother) and sm.symmetric
    rng = np.random.default_rng(0)
    xstar = rng.uniform(size=prob.n_dofs)
    xstar[prob.constrained] = 0.0
    b = jnp.asarray(prob.A @ xstar)
    x = jnp.zeros_like(b)
    for _ in range(200):
        x = sm.apply(S, b, x)
    assert np.linalg.norm(np.asarray(x) - xstar) < 1e-8


def test_gs_rate_beats_jacobi():
    prob = LaplaceProblem.hyper_cube(3, 2)
    mk = lambda t: Config(operator="stencil", is_preconditioner=False,
                          smoother=SmootherConfig(type=t),
                          agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    r_j = measure_vcycle_rate(Hierarchy(prob, mk("jacobi")), 20, seed=0)
    r_gs = measure_vcycle_rate(Hierarchy(prob, mk("symmetric gauss-seidel")), 20, seed=0)
    assert r_gs < r_j
    # reference matrix-path golden with true SGS is 0.0235 (test_hierarchy.cc:343);
    # multicolor ordering lands close
    assert r_gs < 0.06, r_gs


def test_stencil_sublattice_sweep_matches_masked_form():
    """The masked SUBLATTICE sweep (production path: each coefficient read
    once per sweep) computes exactly the same iteration as the reference
    apply-per-color form, in 2D and 3D, symmetric and forward."""
    from mfmg_tpu.solve.operator import apply_op

    for dim, n_ref in ((2, 3), (3, 2)):
        prob = LaplaceProblem.hyper_cube(dim, n_ref, material_property="linear")
        S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
        colors, n_colors = _color_operator(S)
        rng = np.random.default_rng(7)
        b = jnp.asarray(rng.uniform(size=prob.n_dofs))
        x0 = jnp.asarray(rng.uniform(size=prob.n_dofs))
        for symmetric in (False, True):
            sm = build_smoother(S, SmootherConfig(
                type="symmetric gauss-seidel" if symmetric else "gauss-seidel",
                coloring="multicolor"), dtype=jnp.float64)
            x_fast = np.asarray(sm.apply(S, b, x0))
            # reference masked form
            order = list(range(n_colors))
            if symmetric:
                order = order + order[::-1]
            x_ref = x0
            cols = np.asarray(colors)
            for c in order:
                r = apply_op(S, x_ref) - b
                x_ref = jnp.where(jnp.asarray(cols == c),
                                  x_ref - sm.inv_diag * r, x_ref)
            np.testing.assert_allclose(x_fast, np.asarray(x_ref),
                                       rtol=1e-13, atol=1e-13)


def test_native_greedy_color_valid_and_fast():
    """Native greedy coloring produces a proper distance-1 coloring on the
    assembled operator (falls back silently if the toolchain is absent)."""
    from mfmg_tpu import native

    prob = LaplaceProblem.hyper_cube(3, 2)
    from mfmg_tpu.ops.sparse import ell_from_scipy
    E = ell_from_scipy(prob.A, dtype=jnp.float64)
    cols = np.asarray(E.cols)
    vals = np.asarray(E.vals)
    colors = native.greedy_color(cols, vals)
    if colors is None:
        pytest.skip("native kernels unavailable")
    A = prob.A.tocoo()
    mask = (A.row != A.col) & (A.data != 0)
    assert not np.any(colors[A.row[mask]] == colors[A.col[mask]])
    assert colors.max() + 1 <= 16     # greedy stays near-lattice-optimal


def test_ilu0_smoother():
    """ILU(0) — the reference's fourth host smoother option
    (dealii_smoother.cc:38-52).  The factors reproduce A exactly on A's
    sparsity pattern (the ILU(0) defining property), the smoother contracts
    as a standalone iteration, and the 2-level hierarchy with ILU smoothing
    lands in the same rate regime as the reference's SGS configs."""
    import scipy.sparse as sp
    from mfmg_tpu.config import Config, EigensolverConfig
    from mfmg_tpu.solve.smoothers import _ilu0_factor

    prob = LaplaceProblem.hyper_cube(3, 2, material_property="constant")
    A = prob.A
    L, U = _ilu0_factor(A)
    R = L @ U - A.toarray()
    # defect confined OUTSIDE the pattern (fill positions)
    assert np.abs(R[np.asarray(A.todense()) != 0]).max() < 1e-12

    cfg = Config(operator="ell", is_preconditioner=False,
                 eigensolver=EigensolverConfig(constrained_mode="pin"),
                 smoother=SmootherConfig(type="ilu"),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    h = Hierarchy(prob, cfg)
    rate = measure_vcycle_rate(h, n_cycles=20, seed=0)
    # ILU(0) smoothing is at least SGS-strength on this config (reference
    # SGS golden 0.0235237332)
    assert rate < 0.05, rate
