"""ctypes bindings for the native host kernels (native/mfmg_host.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back transparently to the numpy implementations if the toolchain or the
build is unavailable — the framework stays pure-Python-functional either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "mfmg_host.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmfmg_host.so")


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MFMG_TPU_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.POINTER(ctypes.c_int64)
        i32 = ctypes.POINTER(ctypes.c_int32)
        f64 = ctypes.POINTER(ctypes.c_double)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.assemble_agglomerate_batch_uniform.argtypes = [
            i64, i64, f64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.assemble_agglomerate_batch_uniform_f32.argtypes = [
            i64, i64, f64, f32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.stencil_scatter.argtypes = [
            i64, i64, f64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.assemble_patch.argtypes = [
            i64, i64, f64, f64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.ell_pack.argtypes = [i64, i32, f64, f64, i32,
                                 ctypes.c_int64, ctypes.c_int64]
        lib.greedy_color.argtypes = [i32, f64, i32,
                                     ctypes.c_int64, ctypes.c_int64]
        u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.scatter_super_blocks.argtypes = [
            i64, i64, f32, f64, f64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.scatter_super_blocks_f64.argtypes = [
            i64, i64, f64, f64, f64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.agg_row_count.argtypes = [
            i64, u8, i64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64]
        lib.agg_row_blocks.argtypes = [
            i64, u8, u8, i64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64, f64]
        _lib = lib
    except Exception as e:                  # pragma: no cover - toolchain issues
        print(f"[mfmg_tpu] native kernels unavailable ({e}); using numpy fallback",
              file=sys.stderr)
        _lib = None
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def assemble_agglomerate_batch_uniform(cells_per_agg, local_cells, A_loc, n_agg, m,
                                       dtype=np.float64):
    """Returns (n_agg, m, m) batched dense assembly (float64 or float32
    output), or None if native kernels are unavailable."""
    lib = _load()
    if lib is None:
        return None
    cells_per_agg = np.ascontiguousarray(cells_per_agg, dtype=np.int64)
    local_cells = np.ascontiguousarray(local_cells, dtype=np.int64)
    A_loc = np.ascontiguousarray(A_loc, dtype=np.float64)
    n_bc, n_loc = local_cells.shape
    out = np.zeros((n_agg, m, m), dtype=dtype)
    if np.dtype(dtype) == np.float32:
        lib.assemble_agglomerate_batch_uniform_f32(
            _ptr(cells_per_agg, ctypes.c_int64), _ptr(local_cells, ctypes.c_int64),
            _ptr(A_loc, ctypes.c_double), _ptr(out, ctypes.c_float),
            n_agg, n_bc, n_loc, m)
    else:
        lib.assemble_agglomerate_batch_uniform(
            _ptr(cells_per_agg, ctypes.c_int64), _ptr(local_cells, ctypes.c_int64),
            _ptr(A_loc, ctypes.c_double), _ptr(out, ctypes.c_double),
            n_agg, n_bc, n_loc, m)
    return out


def stencil_scatter(rows, oid_ab, A_loc, n_planes, n_nodes):
    """coeffs[oid_ab[a,b], rows[c,a]] += A_loc[c,a,b] over all (c,a,b);
    returns (n_planes, n_nodes) float64 or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    oid_ab = np.ascontiguousarray(oid_ab, dtype=np.int64)
    A_loc = np.ascontiguousarray(A_loc, dtype=np.float64)
    n_cells, n_loc = rows.shape
    out = np.zeros((n_planes, n_nodes))
    lib.stencil_scatter(_ptr(rows, ctypes.c_int64), _ptr(oid_ab, ctypes.c_int64),
                        _ptr(A_loc, ctypes.c_double), _ptr(out, ctypes.c_double),
                        n_cells, n_loc, n_planes, n_nodes)
    return out


def assemble_patch(cell_ids, local_cells, A_loc, m):
    lib = _load()
    if lib is None:
        return None
    cell_ids = np.ascontiguousarray(cell_ids, dtype=np.int64)
    local_cells = np.ascontiguousarray(local_cells, dtype=np.int64)
    A_loc = np.ascontiguousarray(A_loc, dtype=np.float64)
    out = np.zeros((m, m))
    lib.assemble_patch(_ptr(cell_ids, ctypes.c_int64), _ptr(local_cells, ctypes.c_int64),
                       _ptr(A_loc, ctypes.c_double), _ptr(out, ctypes.c_double),
                       len(cell_ids), local_cells.shape[1], m)
    return out


def agg_row_blocks(dm, valid, keep, dof_rows, dof_vals):
    """Per-agglomerate sorted-unique R rows + dense R blocks.

    Returns (arows (n_agg, t_max) int64, t_s (n_agg,) int64,
    Rb (n_agg, t_max, m) float64) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    dm = np.ascontiguousarray(dm, dtype=np.int64)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    keep = np.ascontiguousarray(keep, dtype=np.uint8)
    dof_rows = np.ascontiguousarray(dof_rows, dtype=np.int64)
    dof_vals = np.ascontiguousarray(dof_vals, dtype=np.float64)
    n_agg, m = dm.shape
    q = dof_rows.shape[1]
    t_s = np.zeros(n_agg, dtype=np.int64)
    lib.agg_row_count(_ptr(dm, ctypes.c_int64), _ptr(valid, ctypes.c_uint8),
                      _ptr(dof_rows, ctypes.c_int64), n_agg, m, q,
                      _ptr(t_s, ctypes.c_int64))
    t_max = int(t_s.max()) if n_agg else 0
    arows = np.zeros((n_agg, t_max), dtype=np.int64)
    Rb = np.zeros((n_agg, t_max, m))
    lib.agg_row_blocks(_ptr(dm, ctypes.c_int64), _ptr(valid, ctypes.c_uint8),
                       _ptr(keep, ctypes.c_uint8),
                       _ptr(dof_rows, ctypes.c_int64),
                       _ptr(dof_vals, ctypes.c_double),
                       n_agg, m, q, t_max,
                       _ptr(arows, ctypes.c_int64), _ptr(Rb, ctypes.c_double))
    return arows, t_s, Rb


def scatter_super_blocks(g_of, gpos, K, Mb, n_super, m1p):
    """Fused per-super scatter of Galerkin + Gram blocks.

    Returns (A1, M) of shape (n_super, m1p, m1p) float64, or None."""
    lib = _load()
    if lib is None:
        return None
    g_of = np.ascontiguousarray(g_of, dtype=np.int64)
    gpos = np.ascontiguousarray(gpos, dtype=np.int64)
    Mb = np.ascontiguousarray(Mb, dtype=np.float64)
    n_agg, t_max = gpos.shape
    A1 = np.zeros((n_super, m1p, m1p))
    M = np.zeros((n_super, m1p, m1p))
    if K.dtype == np.float32:
        K = np.ascontiguousarray(K, dtype=np.float32)
        lib.scatter_super_blocks(
            _ptr(g_of, ctypes.c_int64), _ptr(gpos, ctypes.c_int64),
            _ptr(K, ctypes.c_float), _ptr(Mb, ctypes.c_double),
            _ptr(A1, ctypes.c_double), _ptr(M, ctypes.c_double),
            n_agg, t_max, m1p)
    else:
        K = np.ascontiguousarray(K, dtype=np.float64)
        lib.scatter_super_blocks_f64(
            _ptr(g_of, ctypes.c_int64), _ptr(gpos, ctypes.c_int64),
            _ptr(K, ctypes.c_double), _ptr(Mb, ctypes.c_double),
            _ptr(A1, ctypes.c_double), _ptr(M, ctypes.c_double),
            n_agg, t_max, m1p)
    return A1, M


def ell_pack(indptr, indices, data, n_rows, L):
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float64)
    vals = np.zeros((n_rows, L))
    cols = np.zeros((n_rows, L), dtype=np.int32)
    lib.ell_pack(_ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
                 _ptr(data, ctypes.c_double), _ptr(vals, ctypes.c_double),
                 _ptr(cols, ctypes.c_int32), n_rows, L)
    return vals, cols


def greedy_color(cols, vals):
    """Sequential greedy distance-1 coloring of an (n, L) ELL adjacency;
    returns (n,) int32 colors or None if native kernels are unavailable."""
    lib = _load()
    if lib is None:
        return None
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n, L = cols.shape
    colors = np.full(n, -1, dtype=np.int32)
    lib.greedy_color(_ptr(cols, ctypes.c_int32), _ptr(vals, ctypes.c_double),
                     _ptr(colors, ctypes.c_int32), n, L)
    return colors
