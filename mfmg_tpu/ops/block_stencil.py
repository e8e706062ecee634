"""Block-stencil operator: coarse AMGe levels on structured agglomerate grids.

The Galerkin coarse operator of a block-agglomerated structured mesh is
itself structured: coarse dofs (agglomerate, eigenvector) live on the
agglomerate grid and couple only to the 3^dim neighboring agglomerates, so
A_c is a stencil of (n_ev x n_ev) blocks.  The apply is the scalar stencil's
pad-once + shifted-slice sum with one extra contraction over the eigenvector
component — gather-free, unlike the ELL fallback whose XLA gathers dominate
multilevel V-cycles (measured 140 ms of a 145 ms cycle at 2.1M dofs).

Coarse vector layout matches ops/structured_transfer.py: flat index =
e + n_ev * (ax + nax*(ay + nay*az)) — a C-order (az, ay, ax, e) array.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockStencilOperator:
    """coeffs: (n_offsets,) + agg_shape + (n_ev, n_ev); offsets/shape static.

    K is the same data in patches layout, (n_comp, n_comp*(2k+1)^dim, n_sites):
    the apply extracts all windows in ONE `conv_general_dilated_patches` op
    (im2col as a single MXU-friendly convolution) and contracts with K in one
    batched einsum — two large ops instead of n_offsets tiny slice-einsums,
    which dominate multilevel V-cycle time on TPU (measured: the slice-einsum
    coarse level doubled the 3-level cycle to 3.34 ms at 274k dofs).
    """

    coeffs: jax.Array
    K: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    agg_shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_comp: int = dataclasses.field(metadata=dict(static=True))
    radius: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def shape(self):
        n = int(np.prod(self.agg_shape)) * self.n_comp
        return (n, n)

    def __matmul__(self, x):
        return block_stencil_apply(self, x)


@jax.jit
def block_stencil_apply(op: BlockStencilOperator, x: jax.Array) -> jax.Array:
    k, dim = op.radius, len(op.agg_shape)
    w = 2 * k + 1
    # (1, n_comp, *agg_shape) -> patches (1, n_comp*w^dim, *agg_shape),
    # channel-major patch layout (f, tz, ty, tx)
    xg = jnp.moveaxis(x.reshape(op.agg_shape + (op.n_comp,)), -1, 0)[None]
    pat = jax.lax.conv_general_dilated_patches(
        xg, filter_shape=(w,) * dim, window_strides=(1,) * dim,
        padding=[(k, k)] * dim)
    pat = pat.reshape(op.n_comp * w ** dim, -1)          # (f*nt, n_sites)
    y = jnp.einsum("eks,ks->se", op.K, pat)              # (n_sites, n_comp)
    return y.reshape(x.shape)


def block_stencil_from_csr(A: sp.spmatrix, agg_shape: tuple, n_comp: int,
                           dtype=jnp.float32, max_radius: int = 1):
    """Exact block-stencil extraction; returns None if entries fall outside
    the (2*max_radius+1)^dim neighborhood (non-structured coarse graph)."""
    dim = len(agg_shape)
    n_agg = int(np.prod(agg_shape))
    if A.shape[0] != n_agg * n_comp:
        return None
    A = sp.coo_matrix(A)
    # decode flat = e + n_comp * (ax + nax*(ay + nay*az));  agg_shape is
    # C-order (az, ay, ax) so strides on (ax, ay, az) come from reversed dims
    dims_xyz = tuple(reversed(agg_shape))      # (nax, nay, naz)

    def decode(idx):
        e = idx % n_comp
        g = idx // n_comp
        mi = []
        rem = g.copy()
        for d in range(dim):                   # x first
            mi.append(rem % dims_xyz[d])
            rem //= dims_xyz[d]
        return e, np.stack(mi, axis=-1)        # (..., dim) x-first

    er, mr = decode(A.row)
    ec, mc = decode(A.col)
    diff = mc - mr                             # x-first offsets
    if np.abs(diff).max(initial=0) > max_radius:
        return None

    offsets = list(itertools.product(*[range(-max_radius, max_radius + 1)] * dim))  # z..x order
    diff_rev = diff[:, ::-1]                   # (nnz, dim) z..x
    oid = np.zeros(len(A.data), dtype=np.int64)
    for d in range(dim):
        oid = oid * (2 * max_radius + 1) + (diff_rev[:, d] + max_radius)

    # agg flat id in C-order (az, ay, ax)
    strides = np.cumprod((1,) + dims_xyz[:-1])  # x-first strides
    g_flat_x_first = (mr * strides).sum(axis=1)
    # convert x-first flat to C-order flat: they are identical (x fastest)
    coeffs = np.zeros((len(offsets), n_agg, n_comp, n_comp))
    np.add.at(coeffs, (oid, g_flat_x_first, er, ec), A.data)
    coeffs = coeffs.reshape((len(offsets),) + agg_shape + (n_comp, n_comp))

    # patches-layout tensor K[e, f*nt + t, site]: t = C-order (z..x) window
    # index, matching conv_general_dilated_patches' channel-major (f, t) order
    nt = (2 * max_radius + 1) ** dim
    K = coeffs.reshape(nt, n_agg, n_comp, n_comp)        # (t, s, e, f)
    K = K.transpose(2, 3, 0, 1).reshape(n_comp, n_comp * nt, n_agg)
    nonzero = [i for i in range(len(offsets)) if np.any(coeffs[i])]
    coeffs = coeffs[nonzero]
    offsets_nz = tuple(offsets[i] for i in nonzero)
    coeffs_d = jnp.asarray(coeffs, dtype=dtype)
    from mfmg_tpu.ops.fused_cycle import note_host
    note_host(coeffs_d, coeffs)          # spare the fused builder a d2h
    return BlockStencilOperator(coeffs=coeffs_d,
                                K=jnp.asarray(K, dtype=dtype),
                                offsets=offsets_nz, agg_shape=agg_shape,
                                n_comp=n_comp, radius=max_radius)
