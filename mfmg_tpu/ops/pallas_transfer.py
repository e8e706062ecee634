"""Z-tiled Pallas kernels for the fine-level windowed transfers at 129^3+.

The XLA selection-matmul transfer pair (ops/structured_transfer.py) measures
1.32 ms at 129^3 against ~0.1 ms of compulsory traffic — the per-axis
tensordots materialize grid-sized intermediates in HBM with relayouts
between them.  These kernels run the whole per-axis contraction chain per
z-tile in VMEM: the fine vector streams once, the weights stream once
(pre-tiled per z-slab at setup), and every intermediate lives in VMEM.

Layouts (C-order grid (gz, gy, gx), agg (gaz, gay, gax), stride s = w - 1,
AZT agg z-rows per tile, ZWL = AZT*wz window rows, XW/YW = gax*wx/gay*wy):

  restrict: res slab (TZF*gy, gxp) -> contract z (per-tile window selection)
            -> contract y -> contract x -> C [zwl, yw, xw]; per component:
            multiply the W tile slab, block-sum z (reshape+sum over a
            leading dim), y, x -> out lane-block [e, ax, azl*gay + ay].
  prolong:  exact adjoint chain from a b1 lane-slab; a fine z-row on the
            tile boundary receives one window from the NEXT tile's agg rows,
            carried across grid steps in a (gy, gxp) scratch row (grid steps
            run in order on one core, so out block i is final once tile i's
            contribution lands).

All contractions are 3-D dot_generals over dim 1 or dim 2 (the Mosaic-legal
set probed for ops/fused_cycle.py); DMA slab starts/extents obey the
8-row/128-lane rules by construction (AZT chosen so AZT*s*gy % 8 == 0 and
AZT*gay % 128 == 0).

Reference analog: the restriction/prolongation SpMV pair the reference pays
per level (include/mfmg/common/operator.hpp:25-52), here one kernel launch
per direction at HBM speed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfmg_tpu.ops.fused_cycle import _chain_prec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TiledTransferOps:
    """Baked operands of the z-tiled transfer kernels (selection/block-sum
    matrices + per-tile weight slabs in both chain layouts)."""

    SxTp: jax.Array
    SyT: jax.Array
    SzT: jax.Array
    My: jax.Array
    Mx: jax.Array
    Ez: jax.Array
    Wr: jax.Array
    Wp: jax.Array | None = None
    AZT: int = dataclasses.field(metadata=dict(static=True), default=1)
    TZF: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_tiles: int = dataclasses.field(metadata=dict(static=True), default=1)
    gxp: int = dataclasses.field(metadata=dict(static=True), default=128)
    grid: tuple = dataclasses.field(metadata=dict(static=True), default=())
    agg: tuple = dataclasses.field(metadata=dict(static=True), default=())
    win: tuple = dataclasses.field(metadata=dict(static=True), default=())
    c: int = dataclasses.field(metadata=dict(static=True), default=1)


def _cast(a, m):
    if a.dtype != m.dtype:
        if jax.default_backend() == "cpu":      # CPU dot rejects bf16 pairs
            m = m.astype(a.dtype)
        else:
            a = a.astype(m.dtype)
    return a, m


def _c1(a, m, ft):
    """Contract a dim1 with m dim0: (d0, d2, m1)."""
    a, m = _cast(a, m)
    return jax.lax.dot_general(a, m, (((1,), (0,)), ((), ())),
                               precision=_chain_prec(),
                               preferred_element_type=ft)


def _c1T(a, m, ft):
    """Contract a dim1 with m dim1: (d0, d2, m0)."""
    a, m = _cast(a, m)
    return jax.lax.dot_general(a, m, (((1,), (1,)), ((), ())),
                               precision=_chain_prec(),
                               preferred_element_type=ft)


def _c2T(a, m, ft):
    """Contract a dim2 with m dim1: (d0, d1, m0)."""
    a, m = _cast(a, m)
    return jax.lax.dot_general(a, m, (((2,), (1,)), ((), ())),
                               precision=_chain_prec(),
                               preferred_element_type=ft)


def _m(a, m, ft):
    """Plain 2-D matmul a @ m — the chains below merge leading dims so
    every contraction is ONE large MXU matmul (a 3-D dot_general over a
    middle dim lowers to per-batch tiny matmuls whose dispatch dominates:
    the first 3-D formulation of these kernels measured ~1.8 ms/transfer
    pair at 129^3, worse than the XLA chain it replaces)."""
    a, m = _cast(a, m)
    return jax.lax.dot_general(a, m, (((1,), (0,)), ((), ())),
                               precision=_chain_prec(),
                               preferred_element_type=ft)


def _mT(a, m, ft):
    """a @ m.T without materializing the transpose."""
    a, m = _cast(a, m)
    return jax.lax.dot_general(a, m, (((1,), (1,)), ((), ())),
                               precision=_chain_prec(),
                               preferred_element_type=ft)


def transfer_tiled_geom(grid_shape, agg_shape, window_shape):
    """(AZT, TZF, n_tiles, gxp) of the z-tiled layout, or None when no legal
    tiling exists.  TZF = fine z-rows DMA'd per tile (>= AZT*s+1 with
    TZF*gy % 8 == 0)."""
    gz, gy, gx = grid_shape
    gaz, gay, gax = agg_shape
    wz, wy, wx = window_shape
    sz = wz - 1
    if sz <= 0:
        return None
    gxp = -(-gx // 128) * 128
    for AZT in (8, 16, 4, 32, 2):
        if (AZT * sz * gy) % 8 or (AZT * gay) % 128:
            continue
        TZF = AZT * sz + 1
        while (TZF * gy) % 8:
            TZF += 1
        n_tiles = -(-(gaz * sz + 1) // (AZT * sz))
        need = (TZF * gy * gxp * 4
                + AZT * wz * gay * wy * gax * wx * 4
                + 4 * TZF * max(gy, gay * wy) * max(gxp, gax * wx) * 4)
        if need < 100 * 1024 * 1024:
            return AZT, TZF, n_tiles, gxp
    return None


def build_transfer_tiled(tr, dtype=jnp.float32, reduced=False):
    """Bake the z-tiled transfer operands from a StructuredTransfer (uniform
    window w = s+1 per axis); None when the geometry doesn't tile legally.
    reduced=True stores the weight slabs bf16 (the matmul chain runs
    DEFAULT-precision bf16 passes regardless)."""
    if len(tr.grid_shape) != 3:
        return None
    geom = transfer_tiled_geom(tr.grid_shape, tr.agg_shape, tr.window_shape)
    if geom is None:
        return None
    AZT, TZF, n_tiles, gxp = geom
    gz, gy, gx = tr.grid_shape
    gaz, gay, gax = tr.agg_shape
    wz, wy, wx = tr.window_shape
    sz, sy, sx = wz - 1, wy - 1, wx - 1
    c = tr.n_ev
    XW, YW, ZWL = gax * wx, gay * wy, AZT * wz
    # Mosaic DMA tiling: the W slab's minor dim must be a 128-multiple and
    # its second-minor an 8-multiple — pad the window axes (zero weights)
    XWp = -(-XW // 128) * 128
    YWp = -(-YW // 8) * 8

    from mfmg_tpu.ops.structured_transfer import _selection_matrix
    SxTp = np.zeros((gxp, XWp))
    SxTp[:gx, :XW] = _selection_matrix(gax, wx, sx, gx).T
    SyTp = np.zeros((gy, YWp))
    SyTp[:, :YW] = _selection_matrix(gay, wy, sy, gy).T
    SzT = np.zeros((TZF, ZWL))                   # per-tile LOCAL z windows
    for azl in range(AZT):
        for tz in range(wz):
            zf = azl * sz + tz
            if zf < TZF:
                SzT[zf, azl * wz + tz] = 1.0
    My = np.zeros((YWp, gay))
    My[np.arange(YW), np.repeat(np.arange(gay), wy)] = 1.0
    Mx = np.zeros((XWp, gax))
    Mx[np.arange(XW), np.repeat(np.arange(gax), wx)] = 1.0
    Ez = np.zeros((ZWL, AZT))                    # azl -> zwl expansion
    Ez[np.arange(ZWL), np.repeat(np.arange(AZT), wz)] = 1.0

    # W (e, tz,ty,tx, az,ay,ax) -> per-tile slabs [t, e, zwl, ywp, xwp]
    # (ONE layout; the prolong reaches it with in-kernel swaps)
    W = np.asarray(tr.W, dtype=np.float64)
    Wfull = W.transpose(0, 4, 1, 5, 2, 6, 3).reshape(c, gaz * wz, YW, XW)
    Wpad = np.zeros((c, n_tiles * ZWL, YWp, XWp))
    Wpad[:, : gaz * wz, :YW, :XW] = Wfull
    Wr = np.ascontiguousarray(
        Wpad.reshape(c, n_tiles, ZWL, YWp, XWp).transpose(1, 0, 2, 3, 4))

    wdt = jnp.bfloat16 if reduced else dtype

    def j(a, d=dtype):
        return jnp.asarray(a, dtype=d)

    return TiledTransferOps(
        SxTp=j(SxTp), SyT=j(SyTp), SzT=j(SzT),
        My=j(My), Mx=j(Mx), Ez=j(Ez),
        Wr=j(Wr, wdt), Wp=None,
        AZT=AZT, TZF=TZF, n_tiles=n_tiles, gxp=gxp,
        grid=tr.grid_shape, agg=tr.agg_shape, win=tr.window_shape, c=c)


@functools.partial(jax.jit, static_argnames=("AZT", "TZF", "n_tiles", "gxp",
                                             "grid", "agg", "win", "c"))
def pallas_restrict_tiled(res, SxTp, SyT, SzT, My, Mx, Wr,
                          AZT, TZF, n_tiles, gxp, grid, agg, win, c):
    """Windowed restriction of the flat fine vector; returns the coarse
    vector in the (c, gax, gaz*gay)-plane layout PADDED to n_tiles*AZT agg
    z-rows (caller slices lanes to gaz*gay)."""
    gz, gy, gx = grid
    gaz, gay, gax = agg
    wz, wy, wx = win
    sz = wz - 1
    rows_total = (n_tiles - 1) * AZT * sz * gy + TZF * gy
    zrows = -(-rows_total // gy)
    resp = jnp.pad(res.reshape(gz, gy, gx),
                   ((0, zrows - gz), (0, 0), (0, gxp - gx)))
    resp = resp.reshape(-1, gxp)

    ZWL = AZT * wz
    XWp = -(-(gax * wx) // 128) * 128
    YWp = -(-(gay * wy) // 8) * 8

    def kernel(res_ref, SxTp_ref, SyT_ref, SzT_ref, My_ref, Mx_ref, Wr_ref,
               out_ref, slab, wslab, sems):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            res_ref.at[pl.ds(i * AZT * sz * gy, TZF * gy)], slab, sems.at[0])
        cp.start()
        cw = pltpu.make_async_copy(Wr_ref.at[i], wslab, sems.at[1])
        cw.start()
        cp.wait()
        ft = jnp.float32
        # contraction chain as merged 2-D matmuls, ending [ZWL, YWp, XWp]
        v = slab[:].reshape(TZF, gy, gxp)
        v = jnp.swapaxes(jnp.swapaxes(v, 0, 1), 1, 2)   # (gy, gxp, TZF)
        t = _m(v.reshape(gy * gxp, TZF), SzT_ref[:], ft)
        t = t.reshape(gy, gxp, ZWL)
        t = jnp.swapaxes(jnp.swapaxes(t, 0, 1), 1, 2)   # (gxp, ZWL, gy)
        t = _m(t.reshape(gxp * ZWL, gy), SyT_ref[:], ft)
        t = t.reshape(gxp, ZWL, YWp)
        t = jnp.swapaxes(jnp.swapaxes(t, 0, 1), 1, 2)   # (ZWL, YWp, gxp)
        t = _m(t.reshape(ZWL * YWp, gxp), SxTp_ref[:], ft)
        t = t.reshape(ZWL, YWp, XWp)
        cw.wait()
        planes = []
        for e in range(c):
            P = wslab[e].astype(ft) * t                 # (ZWL, YWp, XWp)
            P = P.reshape(AZT, wz, YWp, XWp).sum(axis=1)
            P = jnp.swapaxes(P, 1, 2)                   # (AZT, XWp, YWp)
            P = _m(P.reshape(AZT * XWp, YWp), My_ref[:], ft)
            P = P.reshape(AZT, XWp, gay)
            P = jnp.swapaxes(P, 1, 2)                   # (AZT, gay, XWp)
            P = _m(P.reshape(AZT * gay, XWp), Mx_ref[:], ft)
            planes.append(P.T)                          # (gax, AZT*gay)
        out_ref[:] = jnp.stack(planes, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((c, gax, AZT * gay), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, gax, n_tiles * AZT * gay),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TZF * gy, gxp), res.dtype),
            pltpu.VMEM((c, ZWL, YWp, XWp), Wr.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(resp, SxTp, SyT, SzT, My, Mx, Wr)
    return out


@functools.partial(jax.jit, static_argnames=("AZT", "TZF", "n_tiles", "gxp",
                                             "grid", "agg", "win", "c"))
def pallas_prolong_tiled(b1p, SxTp, SyT, SzT, My, Mx, Ez, Wr,
                        AZT, TZF, n_tiles, gxp, grid, agg, win, c):
    """Adjoint of pallas_restrict_tiled: b1p is the PADDED-lane coarse
    vector (c, gax, n_tiles*AZT*gay); returns the flat fine vector."""
    gz, gy, gx = grid
    gaz, gay, gax = agg
    wz, wy, wx = win
    sz = wz - 1
    BR = AZT * sz * gy                                  # out rows per tile
    ZWL = AZT * wz
    XWp = -(-(gax * wx) // 128) * 128
    YWp = -(-(gay * wy) // 8) * 8

    def kernel(b1_ref, SxTp_ref, SyT_ref, SzT_ref, My_ref, Mx_ref, Ez_ref,
               Wr_ref, out_ref, x1s, wslab, carry, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        cp = pltpu.make_async_copy(
            b1_ref.at[:, :, pl.ds(i * AZT * gay, AZT * gay)], x1s, sems.at[0])
        cp.start()
        cw = pltpu.make_async_copy(Wr_ref.at[i], wslab, sems.at[1])
        cw.start()
        cp.wait()
        cw.wait()
        ft = jnp.float32
        contrib = None
        for e in range(c):
            T = x1s[e].T.reshape(AZT * gay, gax)        # [azl*gay, ax]
            T = _mT(T, Mx_ref[:], ft)                   # (AZT*gay, XWp)
            T = T.reshape(AZT, gay, XWp)
            T = jnp.swapaxes(T, 1, 2)                   # (AZT, XWp, gay)
            T = _mT(T.reshape(AZT * XWp, gay), My_ref[:], ft)
            T = T.reshape(AZT, XWp, YWp)
            T = jnp.swapaxes(jnp.swapaxes(T, 0, 1), 1, 2)   # (XWp, YWp, AZT)
            T = _mT(T.reshape(XWp * YWp, AZT), Ez_ref[:], ft)
            T = T.reshape(XWp, YWp, ZWL)
            T = jnp.swapaxes(jnp.swapaxes(T, 1, 2), 0, 1)   # (ZWL, XWp, YWp)
            T = jnp.swapaxes(T, 1, 2)                   # (ZWL, YWp, XWp)
            Q = wslab[e].astype(ft) * T                 # (ZWL, YWp, XWp)
            Q = jnp.swapaxes(jnp.swapaxes(Q, 0, 1), 1, 2)   # (YWp, XWp, ZWL)
            Q = _mT(Q.reshape(YWp * XWp, ZWL), SzT_ref[:], ft)
            Q = Q.reshape(YWp, XWp, TZF)
            Q = jnp.swapaxes(jnp.swapaxes(Q, 0, 1), 1, 2)   # (XWp, TZF, YWp)
            Q = _mT(Q.reshape(XWp * TZF, YWp), SyT_ref[:], ft)
            Q = Q.reshape(XWp, TZF, gy)
            Q = jnp.swapaxes(jnp.swapaxes(Q, 0, 1), 1, 2)   # (TZF, gy, XWp)
            Q = _mT(Q.reshape(TZF * gy, XWp), SxTp_ref[:], ft)
            Q = Q.reshape(TZF, gy, gxp)
            contrib = Q if contrib is None else contrib + Q
        body = contrib[: AZT * sz].reshape(BR, gxp)
        head = body[:gy] + carry[:]
        carry[:] = contrib[AZT * sz]                    # (gy, gxp)
        out_ref[:] = jnp.concatenate([head, body[gy:]], axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BR, gxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * BR, gxp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, gax, AZT * gay), b1p.dtype),
            pltpu.VMEM((c, AZT * win[0],
                        -(-(agg[1] * win[1]) // 8) * 8,
                        -(-(agg[2] * win[2]) // 128) * 128), Wr.dtype),
            pltpu.VMEM((gy, gxp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(b1p, SxTp, SyT, SzT, My, Mx, Ez, Wr)
    return out


# ------------------------------------------------------------- wrappers --

def tiled_restrict(ops: TiledTransferOps, x: jax.Array) -> jax.Array:
    """Flat fine vector -> flat coarse vector (StructuredTransfer order:
    e + n_ev*(ax + gax*(ay + gay*az)))."""
    gaz, gay, gax = ops.agg
    out = pallas_restrict_tiled(
        x, ops.SxTp, ops.SyT, ops.SzT, ops.My, ops.Mx, ops.Wr,
        AZT=ops.AZT, TZF=ops.TZF, n_tiles=ops.n_tiles,
        gxp=ops.gxp, grid=ops.grid, agg=ops.agg, win=ops.win, c=ops.c)
    # (c, gax, Lpad) -> flat (az, ay, ax, e)
    out = out[:, :, : gaz * gay]
    out = jnp.transpose(out.reshape(ops.c, gax, gaz, gay), (2, 3, 1, 0))
    return out.reshape(-1)


def tiled_prolong(ops: TiledTransferOps, xc: jax.Array) -> jax.Array:
    gz, gy, gx = ops.grid
    gaz, gay, gax = ops.agg
    b1 = xc.reshape(gaz, gay, gax, ops.c)
    b1 = jnp.transpose(b1, (3, 2, 0, 1)).reshape(ops.c, gax, gaz * gay)
    b1p = jnp.pad(b1, ((0, 0), (0, 0),
                       (0, ops.n_tiles * ops.AZT * gay - gaz * gay)))
    out = pallas_prolong_tiled(
        b1p, ops.SxTp, ops.SyT, ops.SzT, ops.My, ops.Mx, ops.Ez, ops.Wr,
        AZT=ops.AZT, TZF=ops.TZF, n_tiles=ops.n_tiles, gxp=ops.gxp,
        grid=ops.grid, agg=ops.agg, win=ops.win, c=ops.c)
    return out[: gz * gy, :gx].reshape(-1)
