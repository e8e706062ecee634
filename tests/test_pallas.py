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
