"""Gather-free restriction/prolongation for structured block agglomerates.

On a structured grid with uniform block agglomerates, the AMGe restriction is
a strided-window operation: coarse dof (agglomerate a, eigenvector e) reads
the fine grid window starting at a*s of width s+1 (windows overlap by one
node plane).  Both directions become static strided slices + small einsums —
no gathers, no scatters — the transfer-operator counterpart of the stencil
SpMV:

  restrict:  out[e, a] = sum_t W[e, t, a] * x[a*s + t]
  prolong:   y[a*s + t] += sum_e W[e, t, a] * xc[e, a]   (overlap-add)

The overlap-add is materialized scatter-free by accumulating, for every
within-block position t < s, the contributions of the 2^dim neighboring
window corners, then a transpose+reshape writes the whole grid at once.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StructuredTransfer:
    """W: (n_ev,) + window_shape + agg_shape weights (C-order, z..x axes).

    window_shape = s+1 per axis; agg_shape = blocks per axis;
    grid_shape = s*agg+1 per axis (the fine node grid).
    Coarse vector layout: flat index = e + n_ev*(ax + nax*(ay + nay*az))
    i.e. a C-order (az, ay, ax, e) array — matching the CSR restriction's
    (agglomerate, eigenvector) row order with x-fastest agglomerate ids.
    """

    W: jax.Array
    window_shape: tuple = dataclasses.field(metadata=dict(static=True))
    agg_shape: tuple = dataclasses.field(metadata=dict(static=True))
    grid_shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_ev(self):
        return self.W.shape[0]

    @property
    def shape(self):
        return (self.n_ev * int(np.prod(self.agg_shape)), int(np.prod(self.grid_shape)))

    def restrict(self, x):
        return structured_restrict(self, x)

    def prolong(self, xc):
        return structured_prolong(self, xc)


def _window_slices(t, strides, agg_shape):
    return tuple(slice(td, td + sd * (ad - 1) + 1, sd)
                 for td, sd, ad in zip(t, strides, agg_shape))


@jax.jit
def structured_restrict(tr: StructuredTransfer, x: jax.Array) -> jax.Array:
    """Windowed contraction via block reshaping: instead of prod(window)
    strided-slice kernels (125 for 4x4x4 Q1 blocks — latency-bound), pad the
    grid by one block per axis, reshape to (blocks, within) pairs, and do one
    einsum per window-corner subset (2^dim total).  Windows overlap their
    upper neighbors by one plane; corner subsets read within-index 0 of the
    shifted block."""
    dim = len(tr.agg_shape)
    s = tuple(w - 1 for w in tr.window_shape)
    na = tr.agg_shape
    xg = x.reshape(tr.grid_shape)
    # pad to (na+1) blocks of s per axis
    xp = jnp.pad(xg, [(0, (a + 1) * sd - g)
                      for a, sd, g in zip(na, s, tr.grid_shape)])
    shape6 = []
    for a, sd in zip(na, s):
        shape6 += [a + 1, sd]
    xb = xp.reshape(shape6)                      # (bz, tz, by, ty, bx, tx)

    letters_b = ["u", "v", "w"][:dim]
    letters_t = ["i", "j", "l"][:dim]
    spec_w = "e" + "".join(letters_t) + "".join(letters_b)
    spec_x = "".join(letters_b[d] + letters_t[d] for d in range(dim))
    spec_o = "e" + "".join(letters_b)
    out = jnp.zeros((tr.n_ev,) + na, dtype=x.dtype)
    for S in itertools.product(*[(0, 1)] * dim):
        # W index: t_d = s_d (singleton) if S_d else 0..s_d-1
        w_idx = tuple(
            (slice(s[d], s[d] + 1) if S[d] else slice(0, s[d]))
            for d in range(dim))
        Wp = tr.W[(slice(None),) + w_idx]        # (e, tz', ty', tx', az, ay, ax)
        # x blocks: shifted by 1 in axes of S, within-index 0 there
        xb_idx = []
        for d in range(dim):
            if S[d]:
                xb_idx += [slice(1, na[d] + 1), slice(0, 1)]
            else:
                xb_idx += [slice(0, na[d]), slice(None)]
        xs = xb[tuple(xb_idx)]                   # (bz, tz', by, ty', bx, tx')
        out = out + jnp.einsum(f"{spec_w},{spec_x}->{spec_o}", Wp, xs)
    perm = tuple(range(1, dim + 1)) + (0,)
    return out.transpose(perm).reshape(-1)


@jax.jit
def structured_prolong(tr: StructuredTransfer, xc: jax.Array) -> jax.Array:
    dim = len(tr.agg_shape)
    strides = tuple(w - 1 for w in tr.window_shape)
    na = tr.agg_shape
    # coarse vector -> (e, az, ay, ax)
    xcg = xc.reshape(na + (tr.n_ev,))
    perm = (dim,) + tuple(range(dim))
    xcg = xcg.transpose(perm)
    # per-window contributions C[t, a] = sum_e W[e,t,a] * xc[e,a]
    C = jnp.einsum("e...,e...->...", tr.W.reshape((tr.n_ev, -1) + na),
                   xcg[:, None])                      # (n_t, az, ay, ax)
    C = C.reshape(tr.window_shape + na)

    # Overlap-add into the extended block grid: D[t<s, a in [0..na]] where
    # each corner subset S contributes C[t with t_d = s_d for d in S] shifted
    # one block along the axes in S.
    D = jnp.zeros(strides + tuple(a + 1 for a in na), dtype=xc.dtype)
    for S in itertools.product(*[(False, True)] * dim):
        t_sel = tuple(slice(sd, sd + 1) if inS else slice(0, sd)
                      for sd, inS in zip(strides, S))
        piece = C[t_sel]
        pad = [( (0, 0) )] * dim + [((1, 0) if inS else (0, 1)) for inS in S]
        piece = jnp.pad(piece, pad)
        dst = tuple(slice(0, 1) if inS else slice(None) for inS in S)
        D = D.at[dst].add(piece)
    # (tz, ty, tx, az+1, ay+1, ax+1) -> (az+1, tz, ay+1, ty, ax+1, tx)
    order = []
    for d in range(dim):
        order.extend([dim + d, d])
    D = D.transpose(order)
    y_ext = D.reshape(tuple((a + 1) * s for a, s in zip(na, strides)))
    return y_ext[tuple(slice(0, g) for g in tr.grid_shape)].reshape(-1)


# Dense-transfer size cap: below this many entries the coarse-level transfer
# is stored as a dense matrix and applied as one MXU matvec (measured 0.009 ms
# vs 1.18 ms for the strided conv at 8192x128 on v5e); above it the windowed
# conv path keeps memory O(window * out_grid).
DENSE_TRANSFER_MAX_ELEMS = 4_000_000


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GeneralWindowTransfer:
    """Windowed transfer between two structured block grids with components.

    Used for AMGe levels >= 1, where restriction rows couple a super-block to
    the member + ring blocks of the previous level: window offsets t in
    [t0, t0+w) per axis with stride s (w > s+1 allowed, unlike the fine-level
    StructuredTransfer).  Restriction is one strided im2col
    (conv_general_dilated_patches) plus a batched contraction; prolongation
    is derived mechanically as the linear transpose.  When the operator is
    small (DENSE_TRANSFER_MAX_ELEMS) a dense copy Rd is stored instead and
    both directions are single MXU matvecs.

    W : (n_out,) + window_shape + (n_in,) + out_grid   weights
    """

    W: jax.Array
    window_shape: tuple = dataclasses.field(metadata=dict(static=True))
    t0: tuple = dataclasses.field(metadata=dict(static=True))
    stride: tuple = dataclasses.field(metadata=dict(static=True))
    in_grid: tuple = dataclasses.field(metadata=dict(static=True))
    out_grid: tuple = dataclasses.field(metadata=dict(static=True))
    n_in: int = dataclasses.field(metadata=dict(static=True))
    n_out: int = dataclasses.field(metadata=dict(static=True))
    Rd: object = None                    # dense (n_out_total, n_in_total)

    def restrict(self, x):
        if self.Rd is not None:
            return _dense_restrict(self.Rd, x)
        return _gwt_restrict(self, x)

    def prolong(self, xc):
        if self.Rd is not None:
            return _dense_prolong(self.Rd, xc)
        dim = len(self.in_grid)
        n = int(np.prod(self.in_grid)) * self.n_in
        f = jax.linear_transpose(
            lambda v: _gwt_restrict(self, v),
            jax.ShapeDtypeStruct((n,), self.W.dtype))
        (y,) = f(xc)
        return y


@jax.jit
def _dense_restrict(Rd, x):
    return Rd @ x


@jax.jit
def _dense_prolong(Rd, xc):
    return xc @ Rd


@jax.jit
def _gwt_restrict(tr: GeneralWindowTransfer, x: jax.Array) -> jax.Array:
    """All windows in ONE conv_general_dilated_patches (strided im2col), then
    one batched contraction — instead of prod(window_shape) strided-slice
    einsums (216 for a 4-stride halo-1 3D window), whose per-op overhead
    dominates multilevel cycles on TPU."""
    dim = len(tr.in_grid)
    xg = jnp.moveaxis(x.reshape(tr.in_grid + (tr.n_in,)), -1, 0)[None]
    # padding (exact, possibly negative on the high side) so output spatial
    # dims equal out_grid: window t in [t0, t0+w) at block positions S*s
    pad = []
    for d in range(dim):
        lo = -tr.t0[d]
        hi = (tr.t0[d] + tr.window_shape[d] - 1
              + tr.stride[d] * (tr.out_grid[d] - 1) - (tr.in_grid[d] - 1))
        pad.append((lo, hi))
    pat = jax.lax.conv_general_dilated_patches(
        xg, filter_shape=tr.window_shape, window_strides=tr.stride,
        padding=pad)                      # (1, n_in*nt, *out_grid), (f,t)-major
    nt = int(np.prod(tr.window_shape))
    pat = pat.reshape(tr.n_in * nt, -1)                  # (f*nt, n_S)
    # W: (n_out, *win, n_in, *out_grid) -> (n_out, n_in*nt, n_S)
    Wk = jnp.moveaxis(tr.W.reshape((tr.n_out, nt, tr.n_in, -1)), 2, 1)
    Wk = Wk.reshape(tr.n_out, tr.n_in * nt, -1)
    out = jnp.einsum("eks,ks->se", Wk, pat)              # (n_S, n_out)
    return out.reshape(-1)


def general_window_transfer_from_csr(R_l, in_grid, n_in, out_grid, n_out,
                                     stride, dtype=jnp.float32,
                                     max_halo: int = 1):
    """Build a GeneralWindowTransfer from a CSR level-l restriction.

    Decodes every entry: row -> (super S, e_out), col -> (block B, e_in),
    t = B - S*stride (must lie in [-max_halo, stride + max_halo)); returns
    None when the sparsity doesn't fit the window (unstructured levels)."""
    import scipy.sparse as sp

    dim = len(in_grid)
    A = sp.coo_matrix(R_l)
    dims_in_xyz = tuple(reversed(in_grid))
    dims_out_xyz = tuple(reversed(out_grid))
    if A.shape != (int(np.prod(out_grid)) * n_out, int(np.prod(in_grid)) * n_in):
        return None

    def decode(idx, n_comp, dims_xyz):
        e = idx % n_comp
        g = idx // n_comp
        mi = []
        rem = g.copy()
        for d in range(dim):
            mi.append(rem % dims_xyz[d])
            rem //= dims_xyz[d]
        return e, np.stack(mi, axis=-1)      # x-first coords

    e_out, S = decode(A.row, n_out, dims_out_xyz)
    e_in, B = decode(A.col, n_in, dims_in_xyz)
    stride_xyz = tuple(reversed(stride))
    t = B - S * np.array(stride_xyz)
    t0_xyz = tuple(-max_halo for _ in range(dim))
    w_xyz = tuple(stride_xyz[d] + 2 * max_halo for d in range(dim))
    if np.any(t < np.array(t0_xyz)) or np.any(t >= np.array(t0_xyz) + np.array(w_xyz)):
        return None

    # W in (e_out, tz, ty, tx, e_in, out-grid C-order) layout
    window_shape = tuple(reversed(w_xyz))
    t_rev = (t - np.array(t0_xyz))[:, ::-1]            # z..x window index
    out_flat = (S * np.cumprod((1,) + dims_out_xyz[:-1])).sum(axis=1)
    W = np.zeros((n_out,) + window_shape + (n_in, int(np.prod(out_grid))))
    tidx = tuple(t_rev[:, d] for d in range(dim))
    np.add.at(W, (e_out,) + tidx + (e_in, out_flat), A.data)
    W = W.reshape((n_out,) + window_shape + (n_in,) + out_grid)
    Rd = None
    if R_l.shape[0] * R_l.shape[1] <= DENSE_TRANSFER_MAX_ELEMS:
        Rd = jnp.asarray(np.asarray(sp.csr_matrix(R_l).todense()), dtype=dtype)
    return GeneralWindowTransfer(
        W=jnp.asarray(W, dtype=dtype), window_shape=window_shape,
        t0=tuple(reversed(t0_xyz)), stride=tuple(reversed(stride_xyz)),
        in_grid=in_grid, out_grid=out_grid, n_in=n_in, n_out=n_out, Rd=Rd)


def structured_transfer_from_batch(mesh, batch, evecs, global_diag,
                                   dtype=jnp.float32):
    """Build the windowed-weight transfer from the structured agglomerate
    batch (same math as amge.restriction.build_restriction: W = PoU weight
    times eigenvector)."""
    if not mesh.is_structured:
        return None
    dim, k = mesh.dim, mesh.degree
    nc = np.asarray(mesh.structured_shape)
    n_agg, m, n_ev = evecs.shape
    if not np.all(batch.valid):
        return None                        # uniform blocks only
    # infer block dims from window size: m = prod(b*k+1)
    # agg grid dims from count; block dims from first agglomerate's dof extent
    mi = mesh.cell_multi_index()
    sel = np.nonzero(batch.dof_map[0] >= 0)[0]
    # use the dof_map extents along each axis
    n1 = nc * k + 1
    dof0 = batch.dof_map[0]
    mx = []
    rem = dof0.copy()
    coords = []
    for d in range(dim):
        coords.append(rem % n1[d])
        rem = rem // n1[d]
    coords = np.stack(coords, axis=-1)
    wdims = coords.max(axis=0) - coords.min(axis=0) + 1   # window per axis, x first
    if int(np.prod(wdims)) != m:
        return None
    strides = wdims - 1
    if np.any(strides < 1) or np.any((n1 - 1) % strides):
        return None
    na = (n1 - 1) // strides                              # aggs per axis, x first
    if int(np.prod(na)) != n_agg:
        return None

    w = batch.diag / global_diag[batch.dof_map]
    Wfull = w[:, :, None] * evecs                         # (n_agg, m, n_ev)
    # reorder: n_agg (x fastest) -> (az, ay, ax); m (x fastest) -> (tz, ty, tx)
    Wfull = Wfull.reshape(tuple(na[::-1]) + tuple(wdims[::-1]) + (n_ev,))
    # current axes: (az, ay, ax, tz, ty, tx, e) -> (e, tz, ty, tx, az, ay, ax)
    Wfull = np.moveaxis(Wfull, -1, 0)
    Wfull = np.moveaxis(Wfull, list(range(1 + dim, 1 + 2 * dim)), list(range(1, 1 + dim)))
    return StructuredTransfer(W=jnp.asarray(Wfull, dtype=dtype),
                              window_shape=tuple(int(v) for v in wdims[::-1]),
                              agg_shape=tuple(int(v) for v in na[::-1]),
                              grid_shape=tuple(int(v) for v in n1[::-1]))
