"""Lanczos eigensolver tests on synthetic operators.

Mirror of the reference's tests/test_lanczos.cc:27-109: a diagonal operator
with equally spaced eigenvalues of configurable multiplicity; Ritz values must
match the exact eigenvalues and residuals ||Av - lambda v|| must be below
tolerance; plain and deflated modes.
"""

import numpy as np
import pytest

from mfmg_tpu.eigen.lanczos import (batched_lanczos_smallest, check_schedule,
                                    lanczos_solve, tridiag_eigenpairs_cw)


def simple_operator(n, multiplicity=1):
    """Diagonal operator with eigenvalues 1+floor(i/mult), the reference's
    SimpleOperator (tests/lanczos_simpleop.templates.hpp)."""
    d = 1.0 + np.arange(n) // multiplicity
    return d, (lambda x: d * x)


@pytest.mark.parametrize("multiplicity", [1, 2])
@pytest.mark.parametrize("n_requested", [4, 8])
def test_lanczos_simple_operator(multiplicity, n_requested):
    n = 1000
    d, mv = simple_operator(n, multiplicity)
    evals, evecs, iters = lanczos_solve(mv, n, n_requested, tol=1e-2,
                                        maxit=2000, percent_overshoot=5,
                                        seed_base=42)
    exact = np.unique(d)[:]  # 1, 2, 3, ...
    # CW filter removes repeated copies: computed evals approximate the
    # distinct smallest eigenvalues (reference test semantics at tol 1e-2)
    for i, ev in enumerate(evals):
        assert abs(ev - exact[i]) < 1e-2 * max(1.0, exact[i]), (i, ev)
    # residuals (reference asserts < tol with max_iterations=2000)
    for i in range(n_requested):
        v = evecs[:, i]
        r = mv(v) - evals[i] * v
        assert np.linalg.norm(r) < 1e-2, (i, np.linalg.norm(r))


def test_lanczos_deflated():
    n = 1000
    d, mv = simple_operator(n, multiplicity=2)
    # deflated: 2 cycles x 2 eigenpairs — can resolve the multiplicity-2
    # pairs that plain Lanczos cannot (reference is_deflated mode)
    evals, evecs, _ = lanczos_solve(mv, n, 4, tol=1e-2, maxit=2000,
                                    percent_overshoot=5, is_deflated=True,
                                    num_cycles=2, num_eigenpairs_per_cycle=2,
                                    seed_base=7)
    assert np.all(np.diff(evals) >= -1e-8)
    for i in range(4):
        v = evecs[:, i]
        r = mv(v) - evals[i] * v
        assert np.linalg.norm(r) < 5e-2


def test_cw_filter_removes_spurious():
    # T eigenvalues with an exactly repeated value are never spurious;
    # a value of T also in T2 (minus first row/col) is.
    alphas = [2.0, 2.0, 2.0]
    betas = [0.0, 1e-15]      # decoupled first entry: 2.0 appears in T and T2
    evals, evecs = tridiag_eigenpairs_cw(alphas, betas, 1)
    # all values coincide at 2.0 -> repeated -> kept
    assert evals is not None
    assert evals[0] == pytest.approx(2.0)


def test_check_schedule_reference_semantics():
    # percent_overshoot=5: checks cluster early then spread ~5% apart
    sched = check_schedule(200, 5)
    assert sched[0] == 1
    assert sched[-1] == 200
    # gaps grow ~5%: it=100 -> next check <= 106
    gaps = np.diff(sched)
    assert all(g >= 1 for g in gaps)
    sched0 = check_schedule(50, 0)
    assert sched0 == list(range(1, 51))


def test_batched_lanczos_matches_eigh():
    """Batched device Lanczos reproduces the batched eigh coarse space."""
    from mfmg_tpu.amge.agglomeration import build_agglomerates
    from mfmg_tpu.amge.local_problems import build_agglomerate_batch
    from mfmg_tpu.config import AgglomerationConfig, EigensolverConfig
    from mfmg_tpu.eigen.batched_eigh import batched_smallest_eigenpairs
    from mfmg_tpu.fem.laplace import LaplaceProblem

    prob = LaplaceProblem.hyper_cube(3, 2)
    agg = build_agglomerates(prob.mesh, AgglomerationConfig(nx=2, ny=2, nz=2))
    batch = build_agglomerate_batch(prob.mesh, prob.A_loc, agg)
    cfg = EigensolverConfig(type="lanczos", n_eigenvectors=2, tolerance=1e-14,
                            max_iterations=200, percent_overshoot=5)
    ev_l, vec_l = batched_lanczos_smallest(batch, cfg, constrained_mode="identity")
    ev_e, vec_e = batched_smallest_eigenpairs(batch, 2, constrained_mode="identity")
    np.testing.assert_allclose(ev_l, ev_e, atol=1e-6)
    # eigenvectors match up to sign
    for g in range(batch.n_agg):
        for k in range(2):
            a, b = vec_l[g, :, k], vec_e[g, :, k]
            assert min(np.linalg.norm(a - b), np.linalg.norm(a + b)) < 1e-5


def test_hierarchy_with_lanczos_matches_golden():
    """The MF golden rate holds with the lanczos eigensolver too (the
    reference's own MF golden uses lanczos, test_hierarchy.cc:353)."""
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, EigensolverConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(3, 2)
    cfg = Config(operator="matrix_free", is_preconditioner=False,
                 eigensolver=EigensolverConfig(type="lanczos", n_eigenvectors=2),
                 smoother=SmootherConfig(type="chebyshev", degree=1),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    h = Hierarchy(prob, cfg)
    rate = measure_vcycle_rate(h, n_cycles=20, seed=0)
    assert rate == pytest.approx(0.0880045475, abs=1e-2), rate


@pytest.mark.parametrize("multiplicity", [1, 2])
@pytest.mark.parametrize("per_cycle", [1, 2])
def test_batched_deflated_lanczos_matches_host(multiplicity, per_cycle):
    """The batched deflated multi-cycle path honors is_deflated / num_cycles /
    num_eigenpairs_per_cycle and returns the same eigenpairs as the
    reference-exact host solve on the SimpleOperator suite (the reference's
    deflated x multiplicity cartesian, test_lanczos.cc:27-109)."""
    from mfmg_tpu.amge.local_problems import AgglomerateBatch
    from mfmg_tpu.config import EigensolverConfig

    n = 120
    n_cycles = 2
    n_req = n_cycles * per_cycle
    # batch of two SimpleOperators with different spectra
    diags = [1.0 + np.arange(n) // multiplicity,
             0.5 + 0.5 * (np.arange(n) // multiplicity)]
    A_agg = np.stack([np.diag(d) for d in diags])
    batch = AgglomerateBatch(
        dof_map=np.tile(np.arange(n), (2, 1)),
        valid=np.ones((2, n), dtype=bool),
        A_agg=A_agg,
        diag=np.stack(diags),
        constrained=np.zeros((2, n), dtype=bool),
        sizes=np.full(2, n, dtype=np.int64),
    )
    cfg = EigensolverConfig(type="lanczos", n_eigenvectors=n_req,
                            tolerance=1e-2, max_iterations=n,
                            percent_overshoot=5, is_deflated=True,
                            num_cycles=n_cycles,
                            num_eigenpairs_per_cycle=per_cycle)
    evals, evecs = batched_lanczos_smallest(batch, cfg, constrained_mode="raw")
    for g, d in enumerate(diags):
        exact = np.sort(np.unique(d))
        mv = lambda x, d=d: d * x
        # deflation resolves multiplicity: with mult=2 and deflation the
        # copies of each eigenvalue become reachable (reference semantics)
        for i in range(n_req):
            v = evecs[g, :, i]
            r = mv(v) - evals[g, i] * v
            assert np.linalg.norm(r) < 5e-2, (g, i, np.linalg.norm(r))
        # eigenvalues approximate the exact smallest ones
        host_ev, _, _ = lanczos_solve(mv, n, n_req, tol=1e-2, maxit=n,
                                      percent_overshoot=5, is_deflated=True,
                                      num_cycles=n_cycles,
                                      num_eigenpairs_per_cycle=per_cycle,
                                      seed_base=3)
        np.testing.assert_allclose(np.sort(evals[g]), np.sort(host_ev), atol=5e-2)


def test_batched_deflated_resolves_multiplicity():
    """With multiplicity 2, plain Lanczos sees each eigenvalue once (CW keeps
    distinct values); 2-cycle deflation recovers both copies — the defining
    behavior of the reference's is_deflated mode."""
    from mfmg_tpu.amge.local_problems import AgglomerateBatch
    from mfmg_tpu.config import EigensolverConfig

    n = 80
    d = 1.0 + np.arange(n) // 2
    batch = AgglomerateBatch(
        dof_map=np.arange(n)[None], valid=np.ones((1, n), dtype=bool),
        A_agg=np.diag(d)[None], diag=d[None],
        constrained=np.zeros((1, n), dtype=bool),
        sizes=np.array([n], dtype=np.int64))
    mk = lambda **kw: EigensolverConfig(type="lanczos", n_eigenvectors=4,
                                        tolerance=1e-2, max_iterations=n,
                                        percent_overshoot=5, **kw)
    ev_plain, _ = batched_lanczos_smallest(batch, mk(), constrained_mode="raw")
    ev_defl, _ = batched_lanczos_smallest(
        batch, mk(is_deflated=True, num_cycles=2, num_eigenpairs_per_cycle=2),
        constrained_mode="raw")
    # plain: distinct values 1,2,3,4 ; deflated: 1,1,2,2
    np.testing.assert_allclose(ev_plain[0], [1, 2, 3, 4], atol=1e-2)
    np.testing.assert_allclose(ev_defl[0], [1, 1, 2, 2], atol=1e-2)
