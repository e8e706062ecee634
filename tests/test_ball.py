"""hyper_ball mesh + hierarchy tests (the reference's curved-geometry family,
tests/laplace.hpp:92-93 and the ball golden rates of test_hierarchy.cc)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
from mfmg_tpu.config import AgglomerationConfig, EigensolverConfig, SmootherConfig
from mfmg_tpu.fem.geometry import compute_geometry
from mfmg_tpu.fem.mesh import hyper_ball
from mfmg_tpu.solve.cg import cg_solve


def test_ball_mesh_geometry():
    for dim, n_ref, n_cells in [(2, 2, 80), (3, 2, 448)]:
        mesh = hyper_ball(dim, n_ref)
        assert mesh.n_cells == n_cells  # 5*4^r (2D) / 7*8^r (3D), deal.II counts
        geom = compute_geometry(mesh)
        assert np.all(geom.JxW > 0), "inverted cells"
        r = np.linalg.norm(mesh.nodes, axis=1)
        assert np.allclose(r[mesh.boundary_dofs], 1.0, atol=1e-12)
        assert r[~mesh.boundary_dofs].max() < 1.0 - 1e-6
        vol = geom.JxW.sum()
        exact = np.pi if dim == 2 else 4.0 / 3.0 * np.pi
        assert abs(vol - exact) / exact < 0.1  # quadratic geometric convergence


def test_disk_poisson_exact_solution():
    """-Δu = 1 on the unit disk: u = (1 - r^2)/4."""
    prob = LaplaceProblem.from_mesh(hyper_ball(2, 3), "constant")
    rhs = prob.assemble_rhs(lambda p: np.ones(p.shape[:-1]))
    x, info = cg_solve(prob.ell_operator(), jnp.asarray(rhs), tol=1e-12, maxiter=2000)
    r2 = (prob.mesh.nodes**2).sum(1)
    err = np.abs(np.asarray(x) - (1.0 - r2) / 4.0).max()
    assert err < 5e-3, err  # O(h^2)


def test_ball_block_walk_produces_full_blocks():
    """The local-face block walk tiles the refined ball into full 2x2x2-cell
    agglomerates (every refined parent cell is exactly one agglomerate)."""
    mesh = hyper_ball(3, 2)
    agg = build_agglomerates(mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    counts = np.bincount(agg)
    assert len(counts) == 56        # 448 cells / 8
    assert np.all(counts == 8)


def test_ball_hierarchy_rates_near_reference():
    """3D ball, n_ref=2, 2 eigvec/agg: the reference's MF-Chebyshev golden is
    0.2981146185 (test_hierarchy.cc:361).

    Why this asserts an interval rather than the literal golden — the gap is
    NOT geometry or the AMGe algorithm; it is deal.II's DoF numbering leaking
    into an under-converged eigenvalue estimate.  Measured evidence:
      * vertex-placement rules (plain averaging vs deal.II's transfinite
        Coons blend, 6 variants) move the rate < 5e-3 (0.331..0.337);
      * the 2x2x2 block walk yields the parent octants — identical to the
        reference's partition by construction (walks of length 2 from each
        first child cannot leave the parent);
      * eigensolver choice (exact eigh vs reference-exact Lanczos) moves it
        ~3e-3; constrained-dof conventions (pin-200 vs identity-1) move it 0
        (no agglomerate's physical spectrum crosses 1);
      * BUT PreconditionChebyshev's 8-iteration CG estimate starts from the
        vector v_i = i%11 - mean laid over the *global DoF numbering*: on the
        ball, random permutations of that pattern give smallest-Ritz values
        0.087..0.204, and the resulting rate spans 0.30..0.39 — an interval
        that contains the reference golden.  Matching it literally requires
        deal.II's internal first-touch numbering of the 7-cell ball table,
        which no reference test pins down.  (On the hyper_cube the 8-step
        estimate is numbering-insensitive, which is why the cube golden
        matches at 1e-5, tests/test_hierarchy.py.)
      * round-3 close-out: an ensemble probe over candidate deal.II
        numberings (first-touch over all 12 sampled coarse-cell orderings
        of the 7-cube table, plus identity and our creation order) gives
        rates 0.311..0.409 — NONE lands within 1e-2 of 0.2981, so the
        literal golden also encodes deal.II internals beyond the numbering
        (likely its exact ball cell table entering the estimate).  Without
        deal.II ground truth (no reference test records the numbering or
        matrix), the honest assertion remains our pinned golden plus the
        containment interval; the MATRIX-path ball goldens below are pinned
        two-sided (our rates are strictly better).
    """
    prob = LaplaceProblem.from_mesh(hyper_ball(3, 2), "constant")
    cfg = Config(is_preconditioner=False,
                 eigensolver=EigensolverConfig(constrained_mode="identity"),
                 smoother=SmootherConfig(type="chebyshev", degree=1,
                                         eig_estimate="dealii_cg"),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert rate == pytest.approx(0.3356, abs=0.005), rate     # our golden
    assert abs(rate - 0.2981146185) < 0.05                    # near reference

    cfg_sgs = Config(is_preconditioner=False,
                     eigensolver=EigensolverConfig(constrained_mode="pin"),
                     smoother=SmootherConfig(type="symmetric gauss-seidel"),
                     agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    rate_sgs = measure_vcycle_rate(Hierarchy(prob, cfg_sgs), 20, seed=0)
    # multicolor SGS beats the reference's lexicographic SGS golden (0.1148)
    assert rate_sgs < 0.1148148381, rate_sgs


def test_ball_matrix_path_goldens_two_sided():
    """Matrix-path ball goldens (test_hierarchy.cc:347,360: arpack
    0.1149021369 / lanczos 0.1148148381) pinned two-sided: the sequential
    (lexicographic) GS hierarchy in our numbering converges strictly FASTER
    than the reference's rate, and our own rate is pinned so regressions are
    caught."""
    prob = LaplaceProblem.from_mesh(hyper_ball(3, 2), "constant")
    cfg = Config(is_preconditioner=False, operator="ell",
                 eigensolver=EigensolverConfig(constrained_mode="pin"),
                 smoother=SmootherConfig(type="gauss-seidel",
                                         coloring="lexicographic"),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert rate < 0.1148148381, rate                    # never worse than ref
    assert rate == pytest.approx(0.1026, abs=5e-3), rate   # our pinned golden


def test_distorted_ball_valid():
    mesh = hyper_ball(2, 3, distort_random=True)
    geom = compute_geometry(mesh)
    assert np.all(geom.JxW > 0)
