"""Uniform apply for the operator representations.

The reference dispatches through the abstract Operator contract
(include/mfmg/common/operator.hpp:25-52) with virtual vmult.  Here an operator
is any registered pytree with an `__matmul__`; dispatch happens at trace time,
so inside `jit` there is zero overhead.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_op(op, x):
    return op @ x


def operator_diagonal(op):
    """Diagonal of an operator (for Jacobi/Chebyshev smoother setup)."""
    from mfmg_tpu.ops.local_apply import MatrixFreeOperator, mf_diagonal
    from mfmg_tpu.ops.sparse import ELLMatrix
    from mfmg_tpu.ops.stencil import StencilOperator

    if isinstance(op, MatrixFreeOperator):
        return mf_diagonal(op)
    from mfmg_tpu.ops.sumfac import SumFactoredOperator
    if isinstance(op, SumFactoredOperator):
        return op.op_diag
    if isinstance(op, ELLMatrix):
        n = op.shape[0]
        rows = jnp.arange(n)[:, None]
        return jnp.sum(jnp.where(op.cols == rows, op.vals, 0.0), axis=1)
    if isinstance(op, StencilOperator):
        zero = op.offsets.index((0,) * len(op.grid_shape))
        return op.coeffs[zero].reshape(-1)
    from mfmg_tpu.ops.block_stencil import BlockStencilOperator
    if isinstance(op, BlockStencilOperator):
        zero = op.offsets.index((0,) * len(op.agg_shape))
        d = jnp.einsum("...ee->...e", op.coeffs[zero])
        return d.reshape(-1)
    raise TypeError(f"unknown operator type {type(op)}")
