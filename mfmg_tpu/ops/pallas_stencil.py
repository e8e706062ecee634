"""Pallas TPU kernel for the variable-coefficient stencil apply.

Design ("resident-x, streamed coefficients"):
  * the (y,x) axes are flattened into one 128-aligned lane dimension, so a
    stencil offset (oz, oy, ox) is a sublane roll by oz plus a lane roll by
    oy*gx+ox — Mosaic supports arbitrary rolls where it forbids unaligned
    slices; roll wrap-around lands in zero padding where the (zero) boundary
    coefficients kill it,
  * the whole padded x grid lives in VMEM (a 65^3 f32 grid is 1.3 MB),
  * the 27 coefficient planes stream from HBM through a double-buffered DMA
    pipeline overlapped with the multiply-accumulate of the previous plane —
    the dominant HBM traffic at exactly one read of each coefficient.

The XLA path (ops/stencil.py) remains the default; this kernel exists for
runtimes/sizes where hand pipelining beats XLA's schedule, and as the
foundation for the fused-smoother kernels.  Grids whose padded x exceeds
VMEM fall back to the XLA path automatically (`fits_vmem`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dispatch cap for the resident-x kernel.  v5e has 128 MiB of physical VMEM
# and the pallas_calls below raise Mosaic's 16 MiB scoped limit accordingly,
# so LARGER grids do fit — but they lose: at 129^3 the resident kernel
# measured 2.77 ms f32 / 1.77 ms bf16 vs the XLA slice-sum's 0.67 / 0.35 ms
# (the per-plane lane rolls hit a cost cliff at F=16896 lanes), while at
# 65^3 (F=4352) the kernel wins ~1.5-2x.  10 MiB keeps the empirically
# winning regime on the kernel and routes big grids to XLA.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
_COMPILER_PARAMS = None


def _compiler_params():
    global _COMPILER_PARAMS
    if _COMPILER_PARAMS is None:
        _COMPILER_PARAMS = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    return _COMPILER_PARAMS


def _layout(grid_shape, offsets):
    gz, gy, gx = grid_shape
    k = max(max(abs(o) for o in off) for off in offsets)
    nf = gy * gx
    max_shift = k * gx + k
    F = -(-(nf + max_shift) // 128) * 128
    gz_pad = -(-(gz + 2 * k) // 8) * 8       # zero rows absorb z-roll wraps
    return k, nf, F, gz_pad


def fits_vmem(grid_shape, offsets, dtype_bytes=4, coeff_bytes=4):
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    need = gz_pad * F * (dtype_bytes * 3            # x, out, acc slack
                         + coeff_bytes * 2)         # double-buffered planes
    return need < VMEM_BUDGET_BYTES


def pick_tile_bz(grid_shape, offsets, dtype_bytes=4, coeff_bytes=4):
    """Largest z-tile (multiple of 8) whose working set fits VMEM, or None."""
    k, nf, F, _ = _layout(grid_shape, offsets)
    rk = -(-2 * k // 8) * 8
    for bz in (64, 32, 16, 8):
        need = F * ((bz + rk) * dtype_bytes        # x slab
                    + 2 * bz * coeff_bytes         # double-buffered planes
                    + 2 * bz * dtype_bytes)        # out block + acc
        if need < VMEM_BUDGET_BYTES:
            return bz
    return None


def pick_sym_tiles(grid_shape) -> int:
    """Smallest z-tile count whose working set (x slab f32 + 2 coeff slabs
    bf16 + acc) fits the VMEM budget; 1 = whole grid resident per step."""
    for n_tiles in (1, 2, 3, 4, 6, 8, 12, 16):
        bz, rows_total, G, F0, FW = tiled_sym_geom(grid_shape, n_tiles)
        need = (bz + 8) * FW * 4 + 2 * (bz + 8) * FW * 2 + bz * F0 * 4
        if need < 90 * 1024 * 1024:
            return n_tiles
    return 16


def tiled_sym_geom(grid_shape, n_tiles=1):
    """Geometry of the guard-padded z-tiled layout: (bz, rows_total, G, F0,
    FW).  Lanes: [G zero guard | nf data | pad to F0 | G zero guard]; rows:
    [1 zero halo | gz data | pad to n_tiles*bz | 1 zero halo].  bz is
    8-aligned (Mosaic output-block sublane constraint)."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    bz = -(-(-(-gz // n_tiles)) // 8) * 8
    # slab = bz + 8 rows (halo 1 each side + alignment pad): HBM DMA row
    # slices must be 8-aligned, so the halo allowance is a full sublane tile
    rows_total = n_tiles * bz + 8
    G = 256
    F0 = -(-nf // 128) * 128
    FW = G + F0 + G
    return bz, rows_total, G, F0, FW


def tiled_sym_supported(grid_shape, offsets, sym_pos) -> bool:
    """The z-tiled symmetric kernel hard-codes a 1-row z-halo and a G-lane
    guard: it is only correct when every symmetric offset has |dz| <= 1 and a
    lane shift |dy*gx + dx| <= G.  Outside that envelope the guard slices
    `xv[1-dz:...]` / `[G-s:...]` would go negative and wrap to the far end of
    the slab — a silently wrong operator (advisor finding, round 4).  Checked
    here at dispatch/build time and asserted again inside the kernel."""
    gz, gy, gx = grid_shape
    _, _, G, _, _ = tiled_sym_geom(grid_shape)
    for i in sym_pos:
        dz, dy, dx = offsets[i]
        if abs(dz) > 1 or abs(dy * gx + dx) > G:
            return False
    return True


def pad_planes_tiled_sym(coeffs, offsets, grid_shape, n_tiles=None):
    """Host-side guard-padded coefficient planes for the z-tiled symmetric
    kernel (one-shot at operator finalization)."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    if n_tiles is None:
        n_tiles = pick_sym_tiles(grid_shape)
    bz, rows_total, G, F0, FW = tiled_sym_geom(grid_shape, n_tiles)
    c = np.asarray(coeffs).reshape(-1, gz, nf)
    out = np.zeros((c.shape[0], rows_total, FW), dtype=c.dtype)
    out[:, 1: 1 + gz, G: G + nf] = c
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape",
                                             "sym_pos", "n_tiles"))
def pallas_stencil_apply_tiled_sym(coeffs_tiled, x, offsets, grid_shape,
                                   sym_pos, n_tiles=None):
    """Z-tiled SYMMETRIC-pair stencil apply for grids beyond VMEM residency
    (129^3+): only the center + positive-offset planes stream from HBM
    ((n_off+1)/2 of the one-sided traffic), and every shifted operand access
    is an unaligned STATIC SLICE READ of guard-padded VMEM slabs — fused by
    Mosaic into the FMA with no roll/relayout ops (measured: chained
    arbitrary lane rolls at F=16896 are the old tiled kernel's 2.8 ms cost
    cliff; slice reads cost ~nothing).

    For each positive offset o = (dz, dy, dx), s = dy*gx + dx:
        acc += C_o[z, l]     * x[z + dz, l + s]        (forward)
        acc += C_o[z - dz, l - s] * x[z - dz, l - s]   (transpose pair)
    Guard zones hold zeros, so out-of-domain reads vanish; invalid neighbor
    pairs are killed by zero boundary coefficients exactly as in the
    resident kernel.  x is re-padded per call in XLA (fuses with the caller's
    elementwise chain); the coefficient planes are padded once at setup
    (pad_planes_tiled_sym).
    """
    gz, gy, gx = grid_shape
    nf = gy * gx
    if n_tiles is None:
        n_tiles = pick_sym_tiles(grid_shape)
    bz, rows_total, G, F0, FW = tiled_sym_geom(grid_shape, n_tiles)
    assert tiled_sym_supported(grid_shape, offsets, sym_pos), (
        f"tiled-sym kernel envelope violated (needs |dz|<=1, |dy*gx+dx|<="
        f"{G}) for grid {grid_shape}, offsets {offsets}")
    ctr = offsets.index((0, 0, 0))
    plane_ids = (ctr,) + tuple(sym_pos)
    n_planes = len(plane_ids)

    xp = jnp.pad(x.reshape(gz, nf),
                 ((1, rows_total - 1 - gz), (G, FW - G - nf)))

    def kernel(c_ref, x_ref, out_ref, xs, cbuf, sems):
        i = pl.program_id(0)
        cpx = pltpu.make_async_copy(x_ref.at[pl.ds(i * bz, bz + 8)], xs,
                                    sems.at[2])
        cpx.start()

        def get_copy(j, slot):
            return pltpu.make_async_copy(
                c_ref.at[plane_ids[j]].at[pl.ds(i * bz, bz + 8)],
                cbuf.at[slot], sems.at[slot])

        get_copy(0, 0).start()
        if n_planes > 1:
            get_copy(1, 1).start()
        cpx.wait()
        get_copy(0, 0).wait()
        xv = xs[:]
        c = cbuf[0].astype(xv.dtype)
        acc = (c[1: 1 + bz, G: G + F0] * xv[1: 1 + bz, G: G + F0])
        for j in range(1, n_planes):
            slot = j % 2
            if j + 1 < n_planes:
                get_copy(j + 1, 1 - slot).start()
            get_copy(j, slot).wait()
            c = cbuf[slot].astype(xv.dtype)
            dz, dy, dx = offsets[plane_ids[j]]
            s = dy * gx + dx
            acc = acc + (c[1: 1 + bz, G: G + F0]
                         * xv[1 + dz: 1 + dz + bz, G + s: G + s + F0])
            acc = acc + (c[1 - dz: 1 - dz + bz, G - s: G - s + F0]
                         * xv[1 - dz: 1 - dz + bz, G - s: G - s + F0])
        out_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # guarded coeff planes
            pl.BlockSpec(memory_space=pl.ANY),     # x slabbed manually
        ],
        out_specs=pl.BlockSpec((bz, F0), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * bz, F0), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz + 8, FW), x.dtype),
            pltpu.VMEM((2, bz + 8, FW), coeffs_tiled.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_compiler_params(),
        interpret=(jax.default_backend() == "cpu"),
    )(coeffs_tiled, xp)
    return y[:gz, :nf].reshape(-1)


# --------------------------------------------------------------------------
# Z-tiled FUSED Chebyshev smoother (grids beyond VMEM residency, e.g. 129^3).
#
# The unfused path at such sizes pays one full coefficient-plane stream per
# polynomial apply (degree applies/smooth) plus unfusable XLA elementwise
# passes between the pallas applies (measured 0.44 ms/smooth + 0.18 ms
# residual at 2.1M).  This kernel runs the WHOLE deal.II-semantics Chebyshev
# application (and optionally the V-cycle residual) per z-tile with the
# symmetric coefficient planes DMA'd once and reused by every term.
#
# Chained applies cross tile boundaries, so each tile works on a slab with an
# 8-row halo each side and SHRINKING per-level margins: after l applies the
# valid region has lost l rows and l*GL lanes on each side; all shifted reads
# are unaligned static VALUE slices (free on Mosaic — only DMA slices need
# alignment).  With degree d + residual the deepest level is d+1, and the
# guard sizing (8 rows, GT = 4*GL lanes) covers d <= 3 smoothing polynomials
# with |dz| <= 1 offsets and lane shifts |dy*gx+dx| <= GL.
# --------------------------------------------------------------------------

_CHEB_GL = 160          # lane margin consumed per chained apply (>= max
                        # lane shift gx+1; 129^3 needs 130)
_CHEB_MAX_LEVELS = 4    # supports polynomial degree <= 3 (+ residual)


def cheb_tiled_geom(grid_shape, n_tiles):
    """(bz, rows_total, GL, GT, F0, FW) of the level-margin layout: lanes
    [GT zeros | nf data | pad to F0 | GT zeros], rows [4 zeros | gz data |
    pad | 4 zeros].  bz is 8-aligned; tile i DMAs rows [i*bz, i*bz+bz+8) —
    the 4-row offset inside the 8-aligned window gives a 4-row halo each
    side, enough for the <= _CHEB_MAX_LEVELS chained applies while keeping
    the slab 8 rows leaner than a full 8+8 halo (VMEM is the binding
    constraint at 129^3: measured 132-136 MB of 128 with the fat halo)."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    bz = -(-(-(-gz // n_tiles)) // 8) * 8
    rows_total = 4 + n_tiles * bz + 4
    GL = _CHEB_GL
    GT = _CHEB_MAX_LEVELS * GL
    F0 = -(-nf // 128) * 128
    FW = GT + F0 + GT
    return bz, rows_total, GL, GT, F0, FW


def cheb_tiled_supported(grid_shape, offsets, sym_pos, degree) -> bool:
    """Kernel envelope: every symmetric offset has dz in {0, 1} and a lane
    shift |dy*gx+dx| <= GL, and degree + 1 (residual) levels fit the guards."""
    gz, gy, gx = grid_shape
    if degree + 1 > min(_CHEB_MAX_LEVELS, 8):
        return False
    for i in sym_pos:
        dz, dy, dx = offsets[i]
        if dz not in (0, 1) or abs(dy * gx + dx) > _CHEB_GL:
            return False
    return True


def pick_cheb_tiles(grid_shape, n_planes, coeff_bytes=2, degree=2) -> int:
    """Smallest tile count whose working set (coeff slabs + x/b/invd slabs +
    stage buffers + the register allocator's live/spill set) fits physical
    VMEM.  The 14-slab live allowance is MEASURED: at 129^3/n_tiles=3 the
    kernel's true footprint was 136 MB against this model's estimate — the
    spill set is ~14 slab-sized temporaries, not the naive 4-5."""
    n_stage = 3 * (degree - 1) + 1
    for n_tiles in (1, 2, 3, 4, 5, 6, 8, 12, 16):
        bz, rows_total, GL, GT, F0, FW = cheb_tiled_geom(grid_shape, n_tiles)
        R = bz + 8
        need = (n_planes * R * FW * coeff_bytes   # resident coeff slabs
                + 3 * R * FW * 4                  # x, b, invd slabs
                + n_stage * R * FW * 4            # stage buffers (upper bd)
                + 14 * R * FW * 4                 # live values + spills
                + 2 * 2 * bz * F0 * 4)            # double-buffered outs
        if need < 120 * 1024 * 1024:
            return n_tiles
    return 16


def pad_planes_cheb(coeffs, offsets, grid_shape, sym_pos, n_tiles=None):
    """Host-side guard-padded center+positive coefficient planes in the
    cheb-tiled layout (one-shot at operator finalization).  Plane order:
    [center] + sym_pos (the kernel indexes positionally)."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    if n_tiles is None:
        n_tiles = pick_cheb_tiles(grid_shape, 1 + len(sym_pos),
                                  np.asarray(coeffs).dtype.itemsize)
    bz, rows_total, GL, GT, F0, FW = cheb_tiled_geom(grid_shape, n_tiles)
    ctr = offsets.index((0, 0, 0))
    ids = (ctr,) + tuple(sym_pos)
    c = np.asarray(coeffs).reshape(-1, gz, nf)[list(ids)]
    out = np.zeros((len(ids), rows_total, FW), dtype=c.dtype)
    out[:, 4: 4 + gz, GT: GT + nf] = c
    return jnp.asarray(out)


def pad_vec_cheb_host(x, grid_shape, n_tiles):
    """Host-numpy zero-padded (rows_total, FW) vector (setup one-shots)."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    bz, rows_total, GL, GT, F0, FW = cheb_tiled_geom(grid_shape, n_tiles)
    v = np.asarray(x).reshape(gz, nf)
    out = np.zeros((rows_total, FW), dtype=v.dtype)
    out[4: 4 + gz, GT: GT + nf] = v
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("grid_shape", "n_tiles"))
def pad_vec_cheb(x, grid_shape, n_tiles):
    gz, gy, gx = grid_shape
    nf = gy * gx
    bz, rows_total, GL, GT, F0, FW = cheb_tiled_geom(grid_shape, n_tiles)
    return jnp.pad(x.reshape(gz, nf),
                   ((4, rows_total - 4 - gz), (GT, FW - GT - nf)))


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape",
                                             "sym_pos", "degree",
                                             "want_res", "n_tiles"))
def pallas_cheb_smooth_tiled(cpt, xpad, bpad, invd_pad, coef, offsets,
                             grid_shape, sym_pos, degree, want_res=False,
                             n_tiles=1):
    """Whole Chebyshev smoother application x <- x - p(D^-1 A)D^-1(Ax-b) for
    grids beyond VMEM residency, z-tiled with per-level shrinking margins.
    With want_res also emits the V-cycle residual A x_s - b from the planes
    already in VMEM.  I/O in the padded (rows_total, FW) cheb layout; all
    padding of x/b/invd must be zero (guards then stay zero through every
    intermediate because the padded coefficient planes are zero).

    deal.II PreconditionChebyshev semantics exactly (solve/smoothers.py
    _chebyshev_vmult; reference dealii_matrix_free_smoother.cc:34-56).

    coef: f32 (2*degree,) RUNTIME array [alpha_1..alpha_d, beta_1..beta_d]
    read from SMEM — theta/delta are data-dependent (Lanczos estimates), and
    baking them as compile-time constants would force the ~8-minute Mosaic
    compile of this kernel on EVERY fresh hierarchy setup; as runtime
    scalars the compiled kernel (and the persistent compilation cache entry)
    is reusable across setups."""
    gz, gy, gx = grid_shape
    nf = gy * gx
    bz, rows_total, GL, GT, F0, FW = cheb_tiled_geom(grid_shape, n_tiles)
    n_levels = degree + (1 if want_res else 0)
    assert cheb_tiled_supported(grid_shape, offsets, sym_pos, degree), (
        f"cheb-tiled kernel envelope violated for grid {grid_shape}")
    ctr = offsets.index((0, 0, 0))
    plane_ids = (ctr,) + tuple(sym_pos)
    n_planes = len(plane_ids)
    R = bz + 8
    shifts = tuple(offsets[i] for i in sym_pos)

    def shp(l):
        # level-l value shape: rows [l, R-l), lanes [l*GL, FW-l*GL)
        return (R - 2 * l, FW - 2 * l * GL)

    # Intermediates carried ACROSS applies are staged through VMEM scratch
    # buffers (full-buffer aligned stores, whole-value loads): a pure value
    # formulation of the unrolled recurrence spilled 160 MB of register
    # slots at 129^3 (measured) — the stores cut the dataflow so the
    # register allocator only ever holds one apply's working set.
    n_stage = 3 * (degree - 1) + (1 if want_res else 0)

    def kernel(c_ref, x_ref, b_ref, invd_ref, coef_ref, *refs):
        alphas = [coef_ref[i] for i in range(degree)]
        betas = [coef_ref[degree + i] for i in range(degree)]
        out_x = refs[0]
        n_fix = 4 + n_stage + 1
        xs_s, bs_s, is_s, cbuf = refs[-n_fix:-n_fix + 4]
        stage = refs[-n_fix + 4:-1]
        sems = refs[-1]
        i = pl.program_id(0)

        def slab(src, dst, sem):
            return pltpu.make_async_copy(src.at[pl.ds(i * bz, R)], dst, sem)

        slab(x_ref, xs_s, sems.at[0]).start()
        slab(b_ref, bs_s, sems.at[1]).start()
        slab(invd_ref, is_s, sems.at[2]).start()
        for j in range(n_planes):
            pltpu.make_async_copy(c_ref.at[j].at[pl.ds(i * bz, R)],
                                  cbuf.at[j], sems.at[3 + j]).start()
        slab(x_ref, xs_s, sems.at[0]).wait()
        slab(b_ref, bs_s, sems.at[1]).wait()
        slab(invd_ref, is_s, sems.at[2]).wait()
        for j in range(n_planes):
            pltpu.make_async_copy(c_ref.at[j].at[pl.ds(i * bz, R)],
                                  cbuf.at[j], sems.at[3 + j]).wait()

        ft = xpad.dtype

        def lvl_slice(ref, l):
            # full-slab scratch -> its level-l window (unaligned static
            # VALUE slices of the loaded slab are ~free on Mosaic)
            return ref[:][l: R - l, l * GL: FW - l * GL]

        def crop(v):
            # one level down: drop 1 row and GL lanes per side
            return v[1: v.shape[0] - 1, GL: v.shape[1] - GL]

        def apply_at(v, l):
            """A applied to a level-l value -> level l+1 (symmetric pairs:
            forward C_o[r]*v[r+dz, c+s] plus transpose C_o[r-dz, c-s]*
            v[r-dz, c-s]); coefficient slabs sliced then upconverted so each
            scoped f32 buffer is slice-sized and dies at its FMA."""
            out_rows = R - 2 * (l + 1)
            lo, hi = (l + 1) * GL, FW - (l + 1) * GL
            w = hi - lo
            c0 = cbuf[0]
            acc = (c0[l + 1: R - l - 1, lo: hi].astype(ft)
                   * v[1: 1 + out_rows, GL: GL + w])
            for j, (dz, dy, dx) in enumerate(shifts):
                s = dy * gx + dx
                c = cbuf[j + 1]
                acc = acc + (c[l + 1: R - l - 1, lo: hi].astype(ft)
                             * v[1 + dz: 1 + dz + out_rows, GL + s: GL + s + w])
                acc = acc + (c[l + 1 - dz: R - l - 1 - dz, lo - s: hi - s]
                             .astype(ft)
                             * v[1 - dz: 1 - dz + out_rows, GL - s: GL - s + w])
            return acc

        # deal.II Chebyshev recurrence with per-level margins; r/p/dx live
        # in stage buffers between applies
        r = apply_at(xs_s[:], 0) - lvl_slice(bs_s, 1)          # level 1
        z = lvl_slice(is_s, 1) * r
        dx = alphas[0] * z
        if degree > 1:
            rb, pb, db = stage[0], stage[1], stage[2]
            rb[:] = r
            pb[:] = z
            db[:] = dx
            for it in range(1, degree):
                Ad = apply_at(db[:], it)                       # level it+1
                r = crop(rb[:]) - Ad
                z = lvl_slice(is_s, it + 1) * r
                p = z + betas[it] * crop(pb[:])
                dx = crop(db[:]) + alphas[it] * p
                if it + 1 < degree:
                    rb2, pb2, db2 = stage[3 * it: 3 * it + 3]
                    rb2[:] = r
                    pb2[:] = p
                    db2[:] = dx
        xs = lvl_slice(xs_s, degree) - dx                      # level degree
        d = degree
        out_x[:] = xs[4 - d: 4 - d + bz, GT - d * GL: GT - d * GL + F0]
        if want_res:
            xb = stage[-1]
            xb[:] = xs
            res = apply_at(xb[:], d) - lvl_slice(bs_s, d + 1)  # level d+1
            refs[1][:] = res[4 - d - 1: 4 - d - 1 + bz,
                             GT - (d + 1) * GL: GT - (d + 1) * GL + F0]

    stage_shapes = []
    for it in range(1, degree):
        stage_shapes += [pltpu.VMEM(shp(it), xpad.dtype)] * 3
    if want_res:
        stage_shapes.append(pltpu.VMEM(shp(degree), xpad.dtype))

    n_out = 2 if want_res else 1
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((bz, F0), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * bz, F0), xpad.dtype)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((R, FW), xpad.dtype),
            pltpu.VMEM((R, FW), xpad.dtype),
            pltpu.VMEM((R, FW), xpad.dtype),
            pltpu.VMEM((n_planes, R, FW), cpt.dtype),
        ] + stage_shapes + [
            pltpu.SemaphoreType.DMA((3 + n_planes,)),
        ],
        # this kernel intentionally fills VMEM (slab scratch + the register
        # allocator's live set — 119 MB measured at 129^3/n_tiles=4);
        # allow everything short of the 128 MB physical capacity
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(cpt, xpad, bpad, invd_pad, coef)
    return outs


def unpad_vec_cheb(y, grid_shape):
    gz, gy, gx = grid_shape
    return y[:gz, : gy * gx].reshape(-1)


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape", "bz"))
def pallas_stencil_apply_tiled(coeffs, x, offsets, grid_shape, bz):
    """z-tiled variant for grids whose padded x exceeds VMEM (e.g. 129^3+):
    each grid step DMAs a (bz + halo) x-slab and streams its coefficient
    rows double-buffered; same roll-based shift algebra as the resident
    kernel, with the z offset folded into the slab's halo rows."""
    gz, gy, gx = grid_shape
    k, nf, F, _ = _layout(grid_shape, offsets)
    n_off = len(offsets)
    rk = -(-2 * k // 8) * 8                        # aligned halo allowance
    nzb = -(-gz // bz)
    GZ = nzb * bz

    # x rows: [k lead halo | gz real | pad to GZ + rk tail]
    xp = jnp.pad(x.reshape(gz, nf), ((k, GZ - gz + rk), (0, F - nf)))
    cp = jnp.pad(coeffs.reshape(n_off, gz, nf),
                 ((0, 0), (0, GZ - gz), (0, F - nf)))
    lane_shift = tuple((-(off[1] * gx + off[2])) % F for off in offsets)
    slab_shift = tuple((-(k + off[0])) % (bz + rk) for off in offsets)

    def kernel(cp_ref, xp_ref, out_ref, xslab, cbuf, sems):
        i = pl.program_id(0)
        cpx = pltpu.make_async_copy(xp_ref.at[pl.ds(i * bz, bz + rk)],
                                    xslab, sems.at[2])
        cpx.start()

        def get_copy(j, slot):
            return pltpu.make_async_copy(cp_ref.at[j].at[pl.ds(i * bz, bz)],
                                         cbuf.at[slot], sems.at[slot])

        get_copy(0, 0).start()
        cpx.wait()
        acc = None
        for j in range(n_off):
            slot = j % 2
            if j + 1 < n_off:
                get_copy(j + 1, 1 - slot).start()
            get_copy(j, slot).wait()
            v = xslab[:]
            if slab_shift[j]:
                v = pltpu.roll(v, slab_shift[j], axis=0)
            v = v[0:bz]
            if lane_shift[j]:
                v = pltpu.roll(v, lane_shift[j], axis=1)
            t = cbuf[slot].astype(v.dtype) * v
            acc = t if acc is None else acc + t
        out_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # coeffs stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),     # x slabbed manually
        ],
        out_specs=pl.BlockSpec((bz, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GZ, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz + rk, F), x.dtype),
            pltpu.VMEM((2, bz, F), coeffs.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_compiler_params(),
        interpret=(jax.default_backend() == "cpu"),
    )(cp, xp)
    return y[:gz, :nf].reshape(-1)


def pad_planes(coeffs, offsets, grid_shape):
    """Pre-pad coefficient planes into the resident kernel's (gz_pad, F)
    layout — done ONCE at operator finalization (ops.stencil.stencil_to_device).
    XLA does NOT hoist the equivalent jnp.pad out of a jitted cycle loop; the
    per-apply padded copy measured ~34 us of a 52 us apply at 65^3.

    Runs in HOST numpy: a jitted device pad at setup time costs a remote
    compilation on tunneled runtimes (measured ~160 s once) for a one-shot
    17 MB copy."""
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    c = np.asarray(coeffs).reshape(-1, gz, nf)
    out = np.zeros((c.shape[0], gz_pad, F), dtype=c.dtype)
    out[:, k: k + gz, :nf] = c
    return jnp.asarray(out)


def pad_vec_host(x, offsets, grid_shape):
    """Host-numpy version of pad_vec for setup-time one-shot pads."""
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    v = np.asarray(x).reshape(gz, nf)
    out = np.zeros((gz_pad, F), dtype=v.dtype)
    out[k: k + gz, :nf] = v
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape",
                                             "sym_pos", "pre_padded"))
def pallas_stencil_apply_sym(coeffs, x, offsets, grid_shape, sym_pos,
                             pre_padded=False):
    """Symmetric-pair resident-x kernel: only the center plane and the
    strictly-positive-offset planes stream from HBM ((n_off+1)/2 of them).

    For each positive offset o the pair contributes
        y += C_o * shift_{+o}(x) + shift_{-o}(C_o * x)
    using C_{-o}[i] = C_o[i-o] (matrix symmetry).  Every roll wrap-around
    either lands in the zero padding or multiplies a zero boundary
    coefficient — the same argument as the one-sided kernel, applied to the
    product plane.  Halves the dominant coefficient byte stream."""
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    n_pos = len(sym_pos)
    ctr = offsets.index((0, 0, 0))
    plane_ids = (ctr,) + tuple(sym_pos)

    xp = jnp.pad(x.reshape(gz, nf), ((k, gz_pad - gz - k), (0, F - nf)))
    cp = (coeffs if pre_padded else
          jnp.pad(coeffs.reshape(-1, gz, nf),
                  ((0, 0), (k, gz_pad - gz - k), (0, F - nf))))
    fwd_lane = tuple((-(offsets[i][1] * gx + offsets[i][2])) % F
                     for i in sym_pos)
    fwd_sub = tuple((-offsets[i][0]) % gz_pad for i in sym_pos)
    bwd_lane = tuple((offsets[i][1] * gx + offsets[i][2]) % F
                     for i in sym_pos)
    bwd_sub = tuple(offsets[i][0] % gz_pad for i in sym_pos)

    def kernel(cp_ref, xp_ref, out_ref, cbuf, sems):
        def get_copy(j, slot):
            return pltpu.make_async_copy(cp_ref.at[plane_ids[j]],
                                         cbuf.at[slot], sems.at[slot])

        get_copy(0, 0).start()
        xv = xp_ref[:]
        if n_pos:
            get_copy(1, 1).start()
        get_copy(0, 0).wait()
        acc = cbuf[0].astype(xv.dtype) * xv            # center plane
        for j in range(n_pos):
            slot = (j + 1) % 2
            if j + 2 < n_pos + 1:
                get_copy(j + 2, 1 - slot).start()
            get_copy(j + 1, slot).wait()
            c = cbuf[slot].astype(xv.dtype)
            v = xv
            if fwd_sub[j]:
                v = pltpu.roll(v, fwd_sub[j], axis=0)
            if fwd_lane[j]:
                v = pltpu.roll(v, fwd_lane[j], axis=1)
            acc = acc + c * v                          # C_o * x[i+o]
            p = c * xv                                 # transpose-scatter pair
            if bwd_sub[j]:
                p = pltpu.roll(p, bwd_sub[j], axis=0)
            if bwd_lane[j]:
                p = pltpu.roll(p, bwd_lane[j], axis=1)
            acc = acc + p
        out_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # coeffs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gz_pad, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, gz_pad, F), coeffs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=(jax.default_backend() == "cpu"),    # CI runs on CPU
    )(cp, xp)
    return y[k: k + gz, :nf].reshape(-1)


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape",
                                             "sym_pos", "degree",
                                             "want_res"))
def pallas_cheb_smooth(cp, xpad, bpad, invd_pad, coef, offsets, grid_shape,
                       sym_pos, degree, want_res=False):
    """One WHOLE Chebyshev smoother application x <- x - p(D^-1 A)D^-1(Ax-b)
    in a single kernel: the (n_off+1)/2 symmetric coefficient planes are
    DMA'd into VMEM ONCE and reused by every polynomial term (degree applies
    = degree x 8.8 MB of streaming in the unfused path at 65^3 bf16), and all
    inter-apply elementwise work happens in VMEM.  With want_res=True the
    kernel also emits the V-cycle residual A x_s - b (one more apply against
    the already-resident planes — rolls only, no extra HBM traffic).

    I/O is in the kernel's padded (gz_pad, F) layout; all padding regions of
    x/b/invd must be zero and then every intermediate stays zero there (the
    padded coefficient planes are zero, so rolls cannot leak values in).

    deal.II PreconditionChebyshev semantics exactly (solve/smoothers.py
    _chebyshev_vmult; reference dealii_matrix_free_smoother.cc:34-56).
    """
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    n_pos = len(sym_pos)
    ctr = offsets.index((0, 0, 0))
    plane_ids = (ctr,) + tuple(sym_pos)
    n_planes = len(plane_ids)

    fwd_lane = tuple((-(offsets[i][1] * gx + offsets[i][2])) % F
                     for i in sym_pos)
    fwd_sub = tuple((-offsets[i][0]) % gz_pad for i in sym_pos)
    bwd_lane = tuple((offsets[i][1] * gx + offsets[i][2]) % F
                     for i in sym_pos)
    bwd_sub = tuple(offsets[i][0] % gz_pad for i in sym_pos)

    def kernel(cp_ref, xp_ref, bp_ref, invd_ref, coef_ref, *out_refs):
        alphas = [coef_ref[i] for i in range(degree)]
        betas = [coef_ref[degree + i] for i in range(degree)]
        out_x = out_refs[0]
        planes = out_refs[-2]
        sems = out_refs[-1]
        for j in range(n_planes):
            pltpu.make_async_copy(cp_ref.at[plane_ids[j]], planes.at[j],
                                  sems.at[j]).start()
        xv = xp_ref[:]
        bv = bp_ref[:]
        invd = invd_ref[:]
        for j in range(n_planes):
            pltpu.make_async_copy(cp_ref.at[plane_ids[j]], planes.at[j],
                                  sems.at[j]).wait()

        def apply_A(v):
            acc = planes[0].astype(v.dtype) * v
            for j in range(n_pos):
                c = planes[j + 1].astype(v.dtype)
                w = v
                if fwd_sub[j]:
                    w = pltpu.roll(w, fwd_sub[j], axis=0)
                if fwd_lane[j]:
                    w = pltpu.roll(w, fwd_lane[j], axis=1)
                acc = acc + c * w
                pr = c * v
                if bwd_sub[j]:
                    pr = pltpu.roll(pr, bwd_sub[j], axis=0)
                if bwd_lane[j]:
                    pr = pltpu.roll(pr, bwd_lane[j], axis=1)
                acc = acc + pr
            return acc

        r = apply_A(xv) - bv
        z = invd * r
        p = z
        dx = alphas[0] * z
        for i in range(1, degree):
            r2 = r - apply_A(dx)
            z = invd * r2
            p = z + betas[i] * p
            dx = dx + alphas[i] * p
        xs = xv - dx
        out_x[:] = xs
        if want_res:
            out_refs[1][:] = apply_A(xs) - bv

    n_out = 2 if want_res else 1
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # planes stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),     # runtime cheb coef
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((gz_pad, F), xpad.dtype)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((n_planes, gz_pad, F), cp.dtype),
            pltpu.SemaphoreType.DMA((n_planes,)),
        ],
        compiler_params=_compiler_params(),
        interpret=(jax.default_backend() == "cpu"),
    )(cp, xpad, bpad, invd_pad, coef)
    return outs if want_res else (outs[0],)


def pad_vec(x, offsets, grid_shape):
    """Flat fine vector -> the resident kernel's zero-padded (gz_pad, F)."""
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    return jnp.pad(x.reshape(gz, nf), ((k, gz_pad - gz - k), (0, F - nf)))


def unpad_vec(xp, offsets, grid_shape):
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    return xp[k: k + gz, :nf].reshape(-1)


@functools.partial(jax.jit, static_argnames=("offsets", "grid_shape",
                                             "pre_padded"))
def pallas_stencil_apply(coeffs, x, offsets, grid_shape, pre_padded=False):
    """y = sum_o C_o * shift(x, o); coeffs (n_off,)+grid_shape, x flat."""
    gz, gy, gx = grid_shape
    k, nf, F, gz_pad = _layout(grid_shape, offsets)
    n_off = len(offsets)

    xp = jnp.pad(x.reshape(gz, nf), ((k, gz_pad - gz - k), (0, F - nf)))
    cp = (coeffs if pre_padded else
          jnp.pad(coeffs.reshape(n_off, gz, nf),
                  ((0, 0), (k, gz_pad - gz - k), (0, F - nf))))
    lane_shift = tuple((-(off[1] * gx + off[2])) % F for off in offsets)
    sub_shift = tuple((-off[0]) % gz_pad for off in offsets)

    def kernel(cp_ref, xp_ref, out_ref, cbuf, sems):
        def get_copy(j, slot):
            return pltpu.make_async_copy(cp_ref.at[j], cbuf.at[slot], sems.at[slot])

        get_copy(0, 0).start()
        acc = None
        for j in range(n_off):
            slot = j % 2
            if j + 1 < n_off:
                get_copy(j + 1, 1 - slot).start()
            get_copy(j, slot).wait()
            v = xp_ref[:]
            if sub_shift[j]:
                v = pltpu.roll(v, sub_shift[j], axis=0)
            if lane_shift[j]:
                v = pltpu.roll(v, lane_shift[j], axis=1)
            # coefficient planes may stream at reduced precision (bf16):
            # upconvert in-register, accumulate in the x dtype
            t = cbuf[slot].astype(v.dtype) * v
            acc = t if acc is None else acc + t
        out_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # coeffs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gz_pad, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, gz_pad, F), coeffs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(),
        interpret=(jax.default_backend() == "cpu"),    # CI runs on CPU
    )(cp, xp)
    return y[k: k + gz, :nf].reshape(-1)
