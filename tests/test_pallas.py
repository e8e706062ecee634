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


@pytest.mark.parametrize("n_tiles,want_res", [(1, True), (2, True), (3, False)])
def test_pallas_cheb_tiled_matches_plain(n_tiles, want_res):
    """Z-tiled fused Chebyshev smoother (the 129^3+ path) == the plain
    ChebyshevSmoother recurrence (and its V-cycle residual), including
    multi-tile slabs with halo-crossing chained applies."""
    import jax

    from mfmg_tpu.ops.pallas_stencil import (pad_planes_cheb, pad_vec_cheb,
                                             pad_vec_cheb_host,
                                             pallas_cheb_smooth_tiled,
                                             unpad_vec_cheb)
    from mfmg_tpu.ops.fused_cycle import _cheb_coeffs
    from mfmg_tpu.solve.smoothers import ChebyshevSmoother
    from mfmg_tpu.solve.operator import apply_op

    from mfmg_tpu.ops.stencil import stencil_from_cell_matrices
    prob = LaplaceProblem.hyper_cube(3, 4, material_property="linear")
    S = stencil_from_cell_matrices(prob.mesh, prob.A_loc, prob.constrained,
                                   prob.diag_raw, dtype=jnp.float32)
    assert S.sym_pos is not None
    diag = prob.A.diagonal().astype(np.float32)
    inv_diag = jnp.asarray(np.where(diag != 0, 1.0 / diag, 0.0))
    sm = ChebyshevSmoother(inv_diag=inv_diag,
                           theta=jnp.float32(1.1), delta=jnp.float32(0.9),
                           degree=2)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    x_ref = sm.apply(S, b, x)
    res_ref = apply_op(S, x_ref) - b

    alphas, betas = _cheb_coeffs(1.1, 0.9, 2)
    coef = jnp.asarray(np.asarray(alphas + betas, np.float32))
    cpt = pad_planes_cheb(np.asarray(S.coeffs), S.offsets, S.grid_shape,
                          S.sym_pos, n_tiles=n_tiles)
    invd_p = pad_vec_cheb_host(np.asarray(inv_diag), S.grid_shape, n_tiles)
    xp = pad_vec_cheb(x, S.grid_shape, n_tiles)
    bp = pad_vec_cheb(b, S.grid_shape, n_tiles)
    outs = pallas_cheb_smooth_tiled(cpt, xp, bp, invd_p, coef, S.offsets,
                                    S.grid_shape, S.sym_pos, 2,
                                    want_res=want_res, n_tiles=n_tiles)
    x_out = unpad_vec_cheb(outs[0], S.grid_shape)
    nrm = float(jnp.linalg.norm(x_ref))
    assert float(jnp.linalg.norm(x_out - x_ref)) < 1e-5 * nrm
    if want_res:
        r_out = unpad_vec_cheb(outs[1], S.grid_shape)
        nr = max(float(jnp.linalg.norm(res_ref)), 1e-30)
        assert float(jnp.linalg.norm(r_out - res_ref)) < 1e-4 * nr
