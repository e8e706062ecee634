"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Analog of the reference's multi-rank MPI test strategy (SURVEY §4: the same
tests at 1/2/4 ranks with identical results) — the sharded V-cycle must equal
the single-device one bitwise-close at every device count.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.hierarchy import vcycle as ref_vcycle
from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
from mfmg_tpu.parallel.sharding import make_mesh, shard_hierarchy, shard_vector, unpad_vector
from mfmg_tpu.parallel.spmd import build_spmd_vcycle
from mfmg_tpu.solve.operator import apply_op


@pytest.fixture(scope="module")
def setup_3d():
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)
    rng = np.random.default_rng(0)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0
    ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                n_smoothing_steps=1, is_preconditioner=False))
    return prob, hier, b, x0, ref


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_spmd_vcycle_matches_single_device(setup_3d, n_devices):
    prob, hier, b, x0, ref = setup_3d
    sv = build_spmd_vcycle(hier, n_devices=n_devices)
    out = sv.from_grid(sv.fn(sv.to_grid(b), sv.to_grid(x0)))
    np.testing.assert_allclose(out, ref, atol=1e-13 * np.abs(ref).max())


def test_spmd_vcycle_rate_matches(setup_3d):
    """Iterated sharded V-cycles converge at the single-device asymptotic
    rate (the multi-rank analog of the reference's golden-rate runs)."""
    prob, hier, b, x0, ref = setup_3d
    op = hier.levels[0].op

    def measure(step, x):
        res_prev = rate = None
        for _ in range(12):
            x = step(x)
            res = float(jnp.linalg.norm(apply_op(op, jnp.asarray(x))))
            if res_prev:
                rate = res / res_prev
            nrm = float(np.linalg.norm(np.asarray(x)))
            x, res_prev = np.asarray(x) / nrm, res / nrm
        return rate

    zero = jnp.zeros_like(jnp.asarray(b))
    rate_single = measure(
        lambda x: ref_vcycle(hier.levels, zero, jnp.asarray(x),
                             n_smoothing_steps=1, is_preconditioner=False), x0)

    sv = build_spmd_vcycle(hier, n_devices=4)
    bg = sv.to_grid(np.zeros_like(b))
    rate_spmd = measure(lambda x: sv.from_grid(sv.fn(bg, sv.to_grid(x))), x0)
    assert rate_spmd == pytest.approx(rate_single, rel=1e-8), (rate_spmd, rate_single)


def test_gspmd_row_sharded_matches(setup_3d):
    """The GSPMD fallback path (row-sharded ELL) also reproduces the
    single-device result."""
    prob, _, b, x0, ref = setup_3d
    cfg = Config(operator="ell", dtype="float64", is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)
    ref_ell = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                    n_smoothing_steps=1, is_preconditioner=False))
    mesh = make_mesh(4)
    levels = shard_hierarchy(hier.levels, mesh)
    bs = shard_vector(mesh, jnp.asarray(b))
    xs = shard_vector(mesh, jnp.asarray(x0))
    out = ref_vcycle(levels, bs, xs, n_smoothing_steps=1, is_preconditioner=False)
    out = np.asarray(unpad_vector(out, prob.n_dofs))
    np.testing.assert_allclose(out, ref_ell, atol=1e-12)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_spmd_multilevel_matches_single_device(n_devices):
    """3-level hierarchy: level 0 sharded, deeper AMGe levels replicated —
    the sharded cycle still equals the single-device one."""
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 max_levels=3,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)
    assert len(hier.levels) == 3
    rng = np.random.default_rng(1)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0
    ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                n_smoothing_steps=1, is_preconditioner=False))
    sv = build_spmd_vcycle(hier, n_devices=n_devices)
    out = sv.from_grid(sv.fn(sv.to_grid(b), sv.to_grid(x0)))
    np.testing.assert_allclose(out, ref, atol=1e-12 * np.abs(ref).max())


@pytest.mark.parametrize("n_devices", [2, 4])
def test_spmd_2d_matches_single_device(n_devices):
    """2D slab decomposition (the reference's 2D MPI runs)."""
    prob = LaplaceProblem.hyper_cube(2, 5, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2))
    hier = Hierarchy(prob, cfg)
    rng = np.random.default_rng(2)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0
    ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                n_smoothing_steps=1, is_preconditioner=False))
    sv = build_spmd_vcycle(hier, n_devices=n_devices)
    out = sv.from_grid(sv.fn(sv.to_grid(b), sv.to_grid(x0)))
    np.testing.assert_allclose(out, ref, atol=1e-12 * np.abs(ref).max())


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (2, 4)])
def test_spmd_2axis_pencils_match_single_device(mesh_shape):
    """2-D (z,y) pencil decomposition with corner-carrying sequential halo
    exchange reproduces the single-device V-cycle bitwise-close (round-2
    verdict item #9: slabs hit the surface-to-volume wall at high device
    counts)."""
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)
    rng = np.random.default_rng(3)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0
    ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                n_smoothing_steps=1, is_preconditioner=False))
    n_dev = int(np.prod(mesh_shape))
    sv = build_spmd_vcycle(hier, n_devices=n_dev, mesh_shape=mesh_shape)
    assert sv.mesh.devices.shape == mesh_shape
    out = sv.from_grid(sv.fn(sv.to_grid(b), sv.to_grid(x0)))
    np.testing.assert_allclose(out, ref, atol=1e-12 * np.abs(ref).max())


def test_spmd_2axis_multilevel_matches(setup_3d):
    """3-level hierarchy on a 2-D pencil mesh."""
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 max_levels=3,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)
    rng = np.random.default_rng(4)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0
    ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                n_smoothing_steps=1, is_preconditioner=False))
    sv = build_spmd_vcycle(hier, n_devices=4, mesh_shape=(2, 2))
    out = sv.from_grid(sv.fn(sv.to_grid(b), sv.to_grid(x0)))
    np.testing.assert_allclose(out, ref, atol=1e-12 * np.abs(ref).max())


def test_spmd_operands_committed_with_target_shardings():
    """Round-5 regression: the sharded V-cycle's per-call operands (padded
    coefficient planes, transfer weights) must be committed with their
    target shardings at build time — a single-device placement makes jit
    re-shard ~60 MB on EVERY call (measured 9.6 s/cycle at P=2/65^3-local
    before the fix)."""
    import jax
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                                 SmootherConfig)
    from mfmg_tpu.parallel.spmd import build_spmd_vcycle

    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32",
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    sv = build_spmd_vcycle(hier, n_devices=2)
    coeffs_p, W_pad, _ = sv.fn.args
    for arr, name in ((coeffs_p, "coeffs"), (W_pad, "W")):
        spec = arr.sharding.spec
        assert any(ax is not None for ax in spec), (name, spec)
        assert arr.sharding.mesh.shape == sv.mesh.shape
