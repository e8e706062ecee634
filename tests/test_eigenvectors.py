"""Agglomerate eigensolver path on a known-spectrum operator.

Analog of the reference's tests/test_eigenvectors.cc:40-232: an evaluator
whose agglomerate matrix is A = diag(1..n) must return eigenvalues 1..k and
unit eigenvectors, with and without constraints."""

import numpy as np
import pytest

from mfmg_tpu.amge.local_problems import AgglomerateBatch
from mfmg_tpu.eigen.batched_eigh import batched_smallest_eigenpairs
from mfmg_tpu.eigen.lanczos import batched_lanczos_smallest
from mfmg_tpu.config import EigensolverConfig


def diag_batch(n=10, n_agg=3, constrained_first=False):
    A = np.zeros((n_agg, n, n))
    diag = np.zeros((n_agg, n))
    for g in range(n_agg):
        d = np.arange(1, n + 1, dtype=float)
        A[g] = np.diag(d)
        diag[g] = d
    constrained = np.zeros((n_agg, n), dtype=bool)
    if constrained_first:
        constrained[:, 0] = True
    return AgglomerateBatch(
        dof_map=np.tile(np.arange(n), (n_agg, 1)),
        valid=np.ones((n_agg, n), dtype=bool),
        A_agg=A, diag=diag, constrained=constrained,
        sizes=np.full(n_agg, n))


def test_diagonal_eigenvalues_unconstrained():
    batch = diag_batch()
    evals, evecs = batched_smallest_eigenpairs(batch, 5, constrained_mode="raw")
    for g in range(batch.n_agg):
        np.testing.assert_allclose(evals[g], [1, 2, 3, 4, 5], atol=1e-12)
        for k in range(5):
            e = np.zeros(10)
            e[k] = 1.0
            assert min(np.linalg.norm(evecs[g, :, k] - e),
                       np.linalg.norm(evecs[g, :, k] + e)) < 1e-12


def test_diagonal_eigenvalues_with_constraint():
    """Constraining dof 0 excludes eigenvalue 1; smallest become 2..6
    (the reference's with-constraints variant)."""
    batch = diag_batch(constrained_first=True)
    evals, evecs = batched_smallest_eigenpairs(batch, 5, constrained_mode="identity")
    for g in range(batch.n_agg):
        np.testing.assert_allclose(evals[g], [2, 3, 4, 5, 6], atol=1e-12)
        assert np.all(np.abs(evecs[g, 0, :]) < 1e-14)  # zero at constrained dof


def test_diagonal_lanczos_agrees():
    batch = diag_batch(n=20)
    cfg = EigensolverConfig(type="lanczos", n_eigenvectors=3, tolerance=1e-10,
                            max_iterations=200, percent_overshoot=5)
    evals, evecs = batched_lanczos_smallest(batch, cfg, constrained_mode="raw")
    for g in range(batch.n_agg):
        np.testing.assert_allclose(evals[g], [1, 2, 3], atol=1e-8)


def test_lobpcg_matches_eigh_and_anasazi_golden():
    """Batched LOBPCG (anasazi analog) reproduces the eigh coarse space and
    the reference's ANASAZI-specific matrix-free golden 0.0868251131
    (test_hierarchy.cc:370) — distinct from the lanczos golden 0.0880045475
    because LOBPCG stops at the loose reference tolerance, perturbing the
    coarse span."""
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.local_problems import build_agglomerate_batch
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
    from mfmg_tpu.eigen.lobpcg import batched_lobpcg_smallest

    prob = LaplaceProblem.hyper_cube(3, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    cfg_e = EigensolverConfig(n_eigenvectors=2, tolerance=1e-10, max_iterations=100)
    ev_l, vec_l = batched_lobpcg_smallest(batch, cfg_e, constrained_mode="identity")
    ev_e, vec_e = batched_smallest_eigenpairs(batch, 2, constrained_mode="identity")
    np.testing.assert_allclose(ev_l, ev_e, atol=1e-2)   # reference anasazi tol

    def anasazi_rate(tol):
        cfg = Config(is_preconditioner=False,
                     eigensolver=EigensolverConfig(type="anasazi",
                                                   n_eigenvectors=2,
                                                   tolerance=tol,
                                                   constrained_mode="identity"),
                     smoother=SmootherConfig(type="chebyshev", degree=1,
                                             eig_estimate="dealii_cg"),
                     agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
        return measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)

    # Converged LOBPCG spans the exact eigenbasis: the rate must match the
    # (eigenbasis-invariant) matrix-free golden family.
    assert abs(anasazi_rate(1e-10) - 0.0880045475) < 1e-2
    # At the reference's loose tolerance our early-stopped span differs from
    # Anasazi's internal iterate (documented deviation, PARITY.md): pin the
    # anasazi golden 0.0868251131 from above — the rate may be better,
    # never worse.
    rate = anasazi_rate(1e-2)
    assert 0.02 < rate < 0.0868251131 + 1e-2, rate


def test_lobpcg_tolerance_and_early_exit():
    """The LOBPCG termination semantics of the Anasazi adapter
    (anasazi.templates.hpp:56-88): the non-relative tolerance is CONSUMED —
    a loose tolerance exits well before max_iterations with every block
    converged, a tight one iterates longer; converged residuals actually
    meet the tolerance."""
    from mfmg_tpu import LaplaceProblem
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.local_problems import build_agglomerate_batch
    from mfmg_tpu.config import AgglomerationConfig
    from mfmg_tpu.eigen.lobpcg import (batched_lobpcg_smallest,
                                       _build_batched_operator)

    prob = LaplaceProblem.hyper_cube(3, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    cfg = EigensolverConfig(n_eigenvectors=2, tolerance=1e-2, max_iterations=200)
    ev, vec, info = batched_lobpcg_smallest(batch, cfg,
                                            constrained_mode="identity",
                                            return_info=True)
    assert info["iterations"] < 200, "no early exit on an easy problem"
    assert info["converged"].all()
    # converged pairs meet the tolerance
    Mop, shifts = _build_batched_operator(batch, "identity")
    AX = np.einsum("gmn,gnk->gmk", Mop, vec)
    R = AX - vec * (ev + shifts[:, None])[:, None, :]
    assert np.linalg.norm(R, axis=1).max() <= 1e-2 * 1.01

    cfg_tight = EigensolverConfig(n_eigenvectors=2, tolerance=1e-6,
                                  max_iterations=200)
    _, _, info_t = batched_lobpcg_smallest(batch, cfg_tight,
                                           constrained_mode="identity",
                                           return_info=True)
    assert info_t["iterations"] > info["iterations"]


def test_lobpcg_full_ortho_modes_agree():
    """full_ortho is consumed: both Anasazi modes (QR full orthogonalization
    vs raw-basis generalized Rayleigh-Ritz) converge to the same
    eigenvalues."""
    from mfmg_tpu import LaplaceProblem
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.local_problems import build_agglomerate_batch
    from mfmg_tpu.config import AgglomerationConfig
    from mfmg_tpu.eigen.lobpcg import batched_lobpcg_smallest

    prob = LaplaceProblem.hyper_cube(3, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    ev_ref, _ = batched_smallest_eigenpairs(batch, 2, constrained_mode="identity")
    for fo in (True, False):
        cfg = EigensolverConfig(n_eigenvectors=2, tolerance=1e-6,
                                max_iterations=200, full_ortho=fo)
        ev, _ = batched_lobpcg_smallest(batch, cfg, constrained_mode="identity")
        np.testing.assert_allclose(ev, ev_ref, atol=1e-5)


def test_lobpcg_init_guess_near_reference_golden():
    """Warm-started anasazi (use_initial_guess) stays near the reference's
    init-guess golden 0.0822670712 (test_hierarchy.cc:391).  Documented
    deviation: the reference's guess is the WorkStream scratch carry-over of
    the PREVIOUS agglomerate's vectors within one setup — sequentially
    order-dependent, with no batched analog — so the literal golden is
    approximated, not pinned (PARITY.md)."""
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(3, 2)
    cfg = Config(operator="matrix_free", is_preconditioner=False,
                 eigensolver=EigensolverConfig(type="anasazi", n_eigenvectors=2,
                                               tolerance=1e-2,
                                               use_initial_guess=True),
                 smoother=SmootherConfig(type="chebyshev", degree=1,
                                         eig_estimate="dealii_cg"),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert 0.02 < rate < 0.0822670712 + 2e-2, rate


def test_arpack_shift_invert_matches_eigh():
    """The genuine shift-invert ARPACK path (eigen/arpack.py, the
    reference's amge_host 'arpack' dispatch) returns the same smallest
    eigenpairs as the exact dense solve, with and without constraints."""
    from mfmg_tpu.eigen.arpack import batched_arpack_smallest

    for constrained_first, mode, expect in ((False, "raw", [1, 2, 3, 4, 5]),
                                            (True, "identity", [2, 3, 4, 5, 6])):
        batch = diag_batch(n=12, constrained_first=constrained_first)
        cfg = EigensolverConfig(type="arpack", n_eigenvectors=5, tolerance=1e-12)
        evals, evecs = batched_arpack_smallest(batch, cfg, constrained_mode=mode)
        for g in range(batch.n_agg):
            np.testing.assert_allclose(evals[g], expect, atol=1e-9)
