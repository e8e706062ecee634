"""Stencil operator tests: exact equivalence with the assembled matrix."""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
from mfmg_tpu.ops.stencil import stencil_from_csr
from mfmg_tpu.solve.operator import operator_diagonal


@pytest.mark.parametrize("dim,n_ref,degree,material", [
    (1, 3, 1, "constant"),
    (2, 3, 1, "linear"),
    (2, 2, 2, "constant"),
    (3, 2, 1, "discontinuous"),
])
def test_stencil_equals_csr(dim, n_ref, degree, material):
    prob = LaplaceProblem.hyper_cube(dim, n_ref, degree=degree, material_property=material)
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs))
    np.testing.assert_allclose(np.asarray(S @ x), prob.A @ np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(operator_diagonal(S)), prob.A.diagonal(), atol=1e-14)


def test_stencil_hierarchy_matches_ell_rate():
    prob = LaplaceProblem.hyper_cube(3, 2)
    mk = lambda op: Config(operator=op, is_preconditioner=False,
                           smoother=SmootherConfig(type="chebyshev", degree=1),
                           agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    r_ell = measure_vcycle_rate(Hierarchy(prob, mk("ell")), 20, seed=0)
    r_st = measure_vcycle_rate(Hierarchy(prob, mk("stencil")), 20, seed=0)
    assert r_st == pytest.approx(r_ell, abs=1e-8)


def test_tiled_sym_kernel_matches_xla():
    """Z-tiled symmetric-pair kernel (interpret mode) == XLA slice-sum.

    The production dispatch uses this kernel on TPU for grids beyond VMEM
    residency (129^3+); here a small grid with a forced 2-tile split
    exercises the guard-padded slab logic, the transpose-pair slice reads
    and the 8-aligned DMA slabs."""
    import jax.numpy as jnp

    from mfmg_tpu import LaplaceProblem
    from mfmg_tpu.ops import stencil as st
    from mfmg_tpu.ops.pallas_stencil import (pad_planes_tiled_sym,
                                             pallas_stencil_apply_tiled_sym)

    p = LaplaceProblem.hyper_cube(3, 4, material_property="linear")
    op = st.stencil_from_cell_matrices(p.mesh, p.A_loc, p.constrained,
                                       p.diag_raw, dtype=jnp.float32)
    assert op.sym_pos is not None
    ct = pad_planes_tiled_sym(np.asarray(op.coeffs), op.offsets,
                              op.grid_shape, n_tiles=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(p.n_dofs)
                    .astype(np.float32))
    y_ref = st._stencil_apply_xla(op, x)
    y = pallas_stencil_apply_tiled_sym(ct, x, op.offsets, op.grid_shape,
                                       op.sym_pos, n_tiles=2)
    err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-6, err
