"""Gather-free stencil operator for structured meshes.

XLA's TPU gather lowers to a scalar loop, which makes ELL SpMV ~1000x slower
than the memory bound (measured 55 ms for 6.5M nnz on v5e).  On a structured
Q_k grid the assembled Laplace operator is a (2k+1)^dim stencil with
variable coefficients:

    y[i] = sum_o C_o[i] * x[i + o]

so the SpMV becomes (2k+1)^dim shifted static slices + fused multiply-adds —
pure VPU work streaming coefficient planes from HBM at full bandwidth, the
TPU-native analog of the reference's matrix-free FEEvaluation cell loop
(laplace_matrix_free.hpp:129-156) and of cuSPARSE csrmv on its device path.

The stencil values are extracted exactly from the assembled (Dirichlet-
eliminated) CSR matrix, so `StencilOperator @ x == A @ x` to roundoff.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from mfmg_tpu.fem.mesh import Mesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StencilOperator:
    """coeffs: (n_offsets,) + grid_shape arrays; offsets static metadata.

    grid_shape is (n1_last, ..., n1_x) — C-order node grid (x fastest in the
    flat dof id).  offsets[o] is the per-axis shift in the same axis order.

    sym_pos: for SYMMETRIC operators, indices of the strictly-positive-offset
    planes (the negative planes satisfy C_{-o}[i] = C_o[i-o] and are never
    read by the apply — only (n_off+1)/2 planes stream from HBM, halving the
    dominant byte stream of the V-cycle).  None disables the pair path.
    """

    coeffs: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    grid_shape: tuple = dataclasses.field(metadata=dict(static=True))
    sym_pos: tuple | None = dataclasses.field(metadata=dict(static=True),
                                              default=None)
    # resident-kernel planes pre-padded to (gz_pad, F) at finalization
    # (stencil_to_device): XLA does not hoist a per-apply jnp.pad out of the
    # cycle loop — it measured ~34 us of a 52 us apply at 65^3
    coeffs_padded: object = None
    # guard-padded planes for the z-tiled symmetric kernel (grids beyond
    # VMEM residency, e.g. 129^3); see pallas_stencil.tiled_sym_geom
    coeffs_tiled: object = None
    # center+positive planes in the z-tiled fused-Chebyshev layout (deeper
    # guards for the chained in-kernel applies); pallas_stencil.cheb_tiled_geom
    coeffs_cheb: object = None

    @property
    def shape(self):
        n = int(np.prod(self.grid_shape))
        return (n, n)

    def __matmul__(self, x):
        return stencil_apply(self, x)

    def stream_bytes(self) -> int:
        """Coefficient bytes one apply actually reads from HBM."""
        n_planes = (1 + len(self.sym_pos) if self.sym_pos is not None
                    else len(self.offsets))
        per = int(np.prod(self.grid_shape)) * self.coeffs.dtype.itemsize
        return n_planes * per


def detect_symmetry(coeffs: np.ndarray, offsets, grid_shape) -> tuple | None:
    """Host-side check that the stencil is symmetric (C_{-o}[i] = C_o[i-o],
    i.e. the matrix it represents is symmetric); returns the indices of the
    strictly positive offsets, or None.

    An offset is "positive" if its first nonzero component is > 0 (total
    lexicographic order, so offsets pair up exactly)."""
    idx = {off: i for i, off in enumerate(offsets)}
    pos = []
    dim = len(grid_shape)
    for i, off in enumerate(offsets):
        if off == (0,) * dim:
            continue
        first = next(c for c in off if c != 0)
        if first < 0:
            continue
        neg = tuple(-c for c in off)
        if neg not in idx:
            return None
        pos.append(i)
        # C_{-o}[i] == C_o[i-o]: compare the negative plane against the
        # positive plane shifted by +o with zero fill
        Cp = coeffs[i].reshape(grid_shape)
        Cn = coeffs[idx[neg]].reshape(grid_shape)
        shifted = np.zeros_like(Cp)
        src = tuple(slice(max(0, -o), min(n, n - o))
                    for o, n in zip(off, grid_shape))
        dst = tuple(slice(max(0, o), min(n, n + o))
                    for o, n in zip(off, grid_shape))
        shifted[dst] = Cp[src]
        if not np.array_equal(shifted, Cn):
            return None
    if (0,) * dim not in idx:
        return None
    return tuple(pos)


def stencil_apply(op: StencilOperator, x: jax.Array) -> jax.Array:
    """y = sum_o C_o * shift(x, o).

    On TPU, 3D grids whose padded x fits VMEM route to the Pallas resident-x
    kernel (ops/pallas_stencil.py): x stays in VMEM and the coefficient
    planes stream once from HBM through a double-buffered DMA pipeline —
    measured 26 us vs 49 us for the XLA path at 65^3 (bit-exact).  Larger
    grids use the XLA slice-sum fallback, which is already bandwidth-bound
    there (measured 129^3: 0.67 ms/apply f32 = ~366 GB/s effective, and
    0.34 ms with bf16 coefficient planes — i.e. the 2x expected from
    halving the dominant byte stream).  The manually-pipelined z-tiled
    Pallas kernel (pallas_stencil_apply_tiled) is kept, bit-exact and
    tested, behind MFMG_TILED_STENCIL=1: at 129^3 it measured 2.8 ms
    (serialized per-plane DMA waits), so it is not the default.
    """
    import os
    sym = op.sym_pos if not os.environ.get("MFMG_NO_SYM_STENCIL") else None
    if (jax.default_backend() == "tpu" and len(op.grid_shape) == 3
            and op.coeffs.dtype in (jnp.float32, jnp.bfloat16)
            and x.dtype == jnp.float32):
        from mfmg_tpu.ops.pallas_stencil import (
            fits_vmem, pallas_stencil_apply, pallas_stencil_apply_sym,
            pallas_stencil_apply_tiled, pick_tile_bz)
        cb = op.coeffs.dtype.itemsize
        if fits_vmem(op.grid_shape, op.offsets, coeff_bytes=cb):
            pre = op.coeffs_padded is not None
            planes = op.coeffs_padded if pre else op.coeffs
            if sym is not None:
                return pallas_stencil_apply_sym(planes, x, op.offsets,
                                                op.grid_shape, sym,
                                                pre_padded=pre)
            return pallas_stencil_apply(planes, x, op.offsets, op.grid_shape,
                                        pre_padded=pre)
        if sym is not None and op.coeffs_tiled is not None:
            from mfmg_tpu.ops.pallas_stencil import (
                pallas_stencil_apply_tiled_sym, tiled_sym_supported)
            if tiled_sym_supported(op.grid_shape, op.offsets, sym):
                return pallas_stencil_apply_tiled_sym(
                    op.coeffs_tiled, x, op.offsets, op.grid_shape, sym)
        if os.environ.get("MFMG_TILED_STENCIL"):
            bz = pick_tile_bz(op.grid_shape, op.offsets, coeff_bytes=cb)
            if bz is not None:
                return pallas_stencil_apply_tiled(op.coeffs, x, op.offsets,
                                                  op.grid_shape, bz)
    # NOTE: the symmetric-pair trick LOSES on the XLA fallback path (129^3:
    # 351 -> 839 us measured — XLA materializes the 13 padded product planes
    # instead of fusing them), so _stencil_apply_xla_sym exists only for the
    # CPU-exactness tests; the production fallback stays one-sided.
    return _stencil_apply_xla(op, x)


@jax.jit
def _stencil_apply_xla(op: StencilOperator, x: jax.Array) -> jax.Array:
    """XLA fallback: one fused elementwise slice-sum expression.

    x is zero-padded once by the stencil radius; every shifted read is then a
    static full-shape slice, so the whole sum is a single XLA fusion with no
    scatter/dynamic-update semantics (an `.at[].add` formulation compiles to
    dozens of unfused kernels inside larger programs — 30x slower measured).
    Out-of-domain reads hit the zero padding and the corresponding stencil
    coefficients are zero anyway (no such matrix entries exist).
    """
    k = max(max(abs(o) for o in off) for off in op.offsets)
    xg = x.reshape(op.grid_shape)
    xp = jnp.pad(xg, k)
    terms = []
    for i, off in enumerate(op.offsets):
        sl = tuple(slice(k + o, k + o + n) for o, n in zip(off, op.grid_shape))
        terms.append(op.coeffs[i] * xp[sl])
    y = terms[0]
    for t in terms[1:]:
        y = y + t
    return y.reshape(x.shape)


@jax.jit
def _stencil_apply_xla_sym(op: StencilOperator, x: jax.Array) -> jax.Array:
    """Symmetric-pair XLA fallback: only the center + positive-offset planes
    are read ((n_off+1)/2 of them), halving the dominant HBM stream.  The
    negative-offset term is the transpose scatter shift_{-o}(C_o * x), exact
    by matrix symmetry (C_{-o}[i] = C_o[i-o]); all shifts are static slices
    of zero-padded arrays, so the whole sum stays one XLA fusion."""
    k = max(max(abs(o) for o in off) for off in op.offsets)
    dim = len(op.grid_shape)
    xg = x.reshape(op.grid_shape)
    xp = jnp.pad(xg, k)
    ctr = op.offsets.index((0,) * dim)
    y = op.coeffs[ctr] * xg
    for i in op.sym_pos:
        off = op.offsets[i]
        sl_p = tuple(slice(k + o, k + o + n)
                     for o, n in zip(off, op.grid_shape))
        y = y + op.coeffs[i] * xp[sl_p]
        P = jnp.pad(op.coeffs[i] * xg, k)
        sl_m = tuple(slice(k - o, k - o + n)
                     for o, n in zip(off, op.grid_shape))
        y = y + P[sl_m]
    return y.reshape(x.shape)


def stencil_layout(mesh: Mesh):
    """Static scatter layout of the structured-mesh stencil extraction:
    (offsets [(z..x) shifts], oid_ab [(a,b)->offset plane], grid_shape,
    n_nodes).  Shared by the local and the distributed extraction paths."""
    k = mesh.degree
    nc = mesh.structured_shape
    dim = mesh.dim
    n1 = tuple(k * c + 1 for c in nc)          # nodes per dim, x first
    grid_shape = tuple(reversed(n1))           # C-order: (z, y, x)
    n_nodes = int(np.prod(n1))

    from mfmg_tpu.fem.reference import reference_element
    lm = reference_element(dim, k).local_multi_index     # (n_loc, dim) x first
    doff = lm[None, :, :] - lm[:, None, :]               # (a, b, dim) x first
    offsets = list(itertools.product(*[range(-k, k + 1)] * dim))  # (z,..,x)
    oid_ab = np.zeros(doff.shape[:2], dtype=np.int64)
    for d in range(dim - 1, -1, -1):           # (z,..,x) enumeration order
        oid_ab = oid_ab * (2 * k + 1) + (doff[:, :, d] + k)
    return offsets, oid_ab, grid_shape, n_nodes


def stencil_from_cell_matrices(mesh: Mesh, A_loc: np.ndarray,
                               constrained: np.ndarray, diag_raw: np.ndarray,
                               dtype=jnp.float32,
                               device: bool = True,
                               raw_planes: np.ndarray | None = None) -> StencilOperator:
    """Exact stencil extraction straight from the per-cell matrices — the
    global CSR is never assembled (the matrix-free setup path,
    dealii_matrix_free_hierarchy_helpers.cc:55-303 analog).

    On a uniform structured mesh the per-axis offset between two local nodes
    of a cell is fixed across cells, so entry (c, a, b) lands in stencil
    plane offset(lm[b]-lm[a]) at row node(c, a): one bincount scatters all
    cell matrices.  Dirichlet elimination is then applied in stencil form:
    constrained rows keep only the raw-diagonal center, and couplings INTO
    constrained columns are zeroed (matches ops.sparse.eliminate_dirichlet).

    device=False keeps the coefficient planes as host numpy (same dtype):
    setup consumers (nnz count, the deal.II CG eigenvalue estimate, coloring)
    all read the coefficients host-side, and on tunneled runtimes a
    device->host readback of the planes costs ~50 s at 2.1M dofs (measured
    4.4 MB/s d2h vs 136 MB/s h2d).  Hierarchy pushes the operator to the
    device exactly once, when the level is finalized.
    """
    if getattr(mesh, "hanging", None) is not None:
        raise NotImplementedError(
            "stencil operators on hanging-node meshes are not supported "
            "yet; use the assembled path (Config.operator='ell') which "
            "condenses the constraints")
    if not mesh.is_structured or mesh.dof_renumbered:
        raise ValueError("stencil operator requires a structured mesh with "
                         "lexicographic dof numbering (use operator='ell' "
                         "after renumber_dofs)")
    k = mesh.degree
    offsets, oid_ab, grid_shape, n_nodes = stencil_layout(mesh)

    if raw_planes is not None:
        # distributed setup: planes already scattered per cell range and
        # sum-reduced across processes (parallel/dist_setup.py)
        coeffs = np.array(raw_planes, dtype=np.float64)
    else:
        rows = mesh.cells.astype(np.int64)               # (n_cells, n_loc)
        from mfmg_tpu import native
        coeffs = native.stencil_scatter(rows, oid_ab, A_loc, len(offsets),
                                        n_nodes)
        if coeffs is None:
            flat = oid_ab[None, :, :] * n_nodes + rows[:, :, None]
            coeffs = np.bincount(flat.reshape(-1), weights=A_loc.reshape(-1),
                                 minlength=len(offsets) * n_nodes)
            coeffs = coeffs.reshape(len(offsets), n_nodes)

    # Dirichlet elimination in stencil form
    con = constrained.reshape(grid_shape)
    kpad = k
    con_pad = np.pad(con, kpad, constant_values=False)
    center = len(offsets) // 2
    for i, off in enumerate(offsets):
        sl = tuple(slice(kpad + o, kpad + o + n) for o, n in zip(off, grid_shape))
        col_con = con_pad[sl].reshape(-1)                # target-col constrained?
        if i == center:
            coeffs[i] = np.where(constrained, diag_raw, coeffs[i])
        else:
            coeffs[i] = np.where(constrained | col_con, 0.0, coeffs[i])

    coeffs = coeffs.reshape((len(offsets),) + grid_shape)
    nonzero = [i for i in range(len(offsets)) if np.any(coeffs[i])]
    coeffs = coeffs[nonzero]
    offsets = tuple(offsets[i] for i in nonzero)
    sym_pos = detect_symmetry(coeffs, offsets, grid_shape)
    coeffs = (jnp.asarray(coeffs, dtype=dtype) if device
              else coeffs.astype(jnp.dtype(dtype)))
    return StencilOperator(coeffs=coeffs,
                           offsets=offsets, grid_shape=grid_shape,
                           sym_pos=sym_pos)


def stencil_to_device(op: StencilOperator) -> StencilOperator:
    """Push a host-built stencil operator's planes to the device (no-op if
    already there)."""
    import os
    host_coeffs = op.coeffs if isinstance(op.coeffs, np.ndarray) else None
    if host_coeffs is not None:
        op = StencilOperator(coeffs=jnp.asarray(op.coeffs),
                             offsets=op.offsets, grid_shape=op.grid_shape,
                             sym_pos=op.sym_pos)
    if (op.coeffs_padded is None and op.coeffs_tiled is None
            and jax.default_backend() == "tpu" and len(op.grid_shape) == 3):
        from mfmg_tpu.ops.pallas_stencil import (fits_vmem, pad_planes,
                                                 pad_planes_tiled_sym,
                                                 tiled_sym_supported)
        # pad from the host copy when available: a d2h readback of the
        # planes costs seconds on tunneled runtimes (4.4 MB/s measured)
        src = host_coeffs if host_coeffs is not None else op.coeffs
        if fits_vmem(op.grid_shape, op.offsets,
                     coeff_bytes=op.coeffs.dtype.itemsize):
            op = dataclasses.replace(
                op, coeffs_padded=pad_planes(src, op.offsets, op.grid_shape))
        elif (op.sym_pos is not None
              and tiled_sym_supported(op.grid_shape, op.offsets, op.sym_pos)):
            # offsets outside the kernel's halo/guard envelope (|dz|>1 or a
            # lane shift beyond the guard, e.g. degree-2 stencils or gx>255)
            # stay on the XLA fallback — the kernel would silently wrap
            cheb = None
            if os.environ.get("MFMG_TILED_CHEB"):
                # opt-in (closed-as-bounded: see solve/smoothers.py)
                from mfmg_tpu.ops.pallas_stencil import pad_planes_cheb
                cheb = pad_planes_cheb(src, op.offsets, op.grid_shape,
                                       op.sym_pos)
            op = dataclasses.replace(
                op, coeffs_tiled=pad_planes_tiled_sym(src, op.offsets,
                                                      op.grid_shape),
                coeffs_cheb=cheb)
    return op


def stencil_from_csr(A: sp.spmatrix, mesh: Mesh, dtype=jnp.float32) -> StencilOperator:
    """Exact stencil extraction from an assembled matrix on a structured mesh."""
    if not mesh.is_structured:
        raise ValueError("stencil operator requires a structured mesh")
    k = mesh.degree
    nc = mesh.structured_shape
    dim = mesh.dim
    n1 = tuple(k * c + 1 for c in nc)          # nodes per dim, x first
    grid_shape = tuple(reversed(n1))           # C-order: (z, y, x)

    A = sp.coo_matrix(A)
    # decode per-axis offset of each entry from row/col multi-indices (x fastest)
    def multi(idx):
        out = []
        rem = idx.copy()
        for d in range(dim):
            out.append(rem % n1[d])
            rem = rem // n1[d]
        return np.stack(out, axis=-1)          # (..., dim) x first

    mr, mc = multi(A.row), multi(A.col)
    diff = mc - mr                             # per-axis offsets, x first
    if np.abs(diff).max() > k:
        raise ValueError("matrix has entries outside the (2k+1)^dim stencil")

    offsets = list(itertools.product(*[range(-k, k + 1)] * dim))  # (z,...,x) order
    # offset id from diff (x first -> reverse to match offsets tuple order)
    diff_rev = diff[:, ::-1]                   # (nnz, dim) in (z, y, x) order
    oid = np.zeros(len(A.data), dtype=np.int64)
    for d in range(dim):
        oid = oid * (2 * k + 1) + (diff_rev[:, d] + k)

    coeffs = np.zeros((len(offsets), int(np.prod(n1))))
    np.add.at(coeffs, (oid, A.row), A.data)
    coeffs = coeffs.reshape((len(offsets),) + grid_shape)

    # drop all-zero offset planes (corners of the stencil box absent in Q1 2D etc.)
    nonzero = [i for i in range(len(offsets)) if np.any(coeffs[i])]
    coeffs = coeffs[nonzero]
    offsets = tuple(offsets[i] for i in nonzero)
    sym_pos = detect_symmetry(coeffs, offsets, grid_shape)
    return StencilOperator(coeffs=jnp.asarray(coeffs, dtype=dtype),
                           offsets=offsets, grid_shape=grid_shape,
                           sym_pos=sym_pos)
