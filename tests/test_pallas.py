"""Pallas stencil kernel == assembled matrix (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu.fem.laplace import LaplaceProblem
from mfmg_tpu.ops.pallas_stencil import fits_vmem, pallas_stencil_apply
from mfmg_tpu.ops.stencil import stencil_from_csr


@pytest.mark.parametrize("dim,n_ref", [(3, 2), (3, 3)])
def test_pallas_stencil_equals_csr(dim, n_ref):
    prob = LaplaceProblem.hyper_cube(dim, n_ref, material_property="linear")
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
    assert fits_vmem(S.grid_shape, S.offsets)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs))
    y = pallas_stencil_apply(S.coeffs, x, S.offsets, S.grid_shape)
    np.testing.assert_allclose(np.asarray(y), prob.A @ np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("bz", [8, 16])
def test_pallas_stencil_tiled_equals_csr(bz):
    """z-tiled kernel (the 129^3+ path) == assembled matrix, including the
    ragged last tile (gz=17 not divisible by bz)."""
    from mfmg_tpu.ops.pallas_stencil import pallas_stencil_apply_tiled
    prob = LaplaceProblem.hyper_cube(3, 4, material_property="linear")
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs))
    y = pallas_stencil_apply_tiled(S.coeffs, x, S.offsets, S.grid_shape, bz)
    np.testing.assert_allclose(np.asarray(y), prob.A @ np.asarray(x), atol=1e-12)


def test_pallas_stencil_tiled_bf16_close():
    """bf16 coefficient streaming: matches the f64 apply to bf16 accuracy."""
    from mfmg_tpu.ops.pallas_stencil import pallas_stencil_apply_tiled
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    S = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs), dtype=jnp.float32)
    y = pallas_stencil_apply_tiled(S.coeffs, x, S.offsets, S.grid_shape, 8)
    ref = prob.A @ np.asarray(x, dtype=np.float64)
    err = np.abs(np.asarray(y, dtype=np.float64) - ref).max()
    scale = np.abs(ref).max()
    assert err < 4e-2 * scale, (err, scale)
