"""SPMD stencil V-cycle: slab decomposition + ppermute halo exchange.

The TPU-native analog of the reference's MPI domain decomposition with ghost
exchange (reference §2.4).  Where the reference CUDA path all-gathers the
whole source vector per SpMV (sparse_matrix_device.templates.cuh:104-138) and
its AMGX path builds one-ring halo maps (cuda_solver.cu:264-443), here the
structured node grid is sharded into z-slabs over a 1-D device mesh and each
stencil apply exchanges exactly the k boundary planes with its two neighbors
via `lax.ppermute` — the one-ring pattern, on ICI, overlappable with interior
compute by XLA.

Layout: the z axis is padded to naz_pad = P*ceil((naz+1)/P)-ish agglomerate
windows of sz planes each (padded planes carry zero stencil coefficients and
zero restriction weights, so padded dofs remain exactly zero and contribute
nothing), giving every device an identical window-aligned slab.  The coarse
problem is replicated (all-gather of the small coarse residual), matching the
reference's gathered direct coarse solves.  Prolongation is generated as the
exact linear transpose of the sharded restriction (jax.linear_transpose), so
XLA emits the reversed ppermute/scatter pattern automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfmg_tpu.ops.stencil import StencilOperator
from mfmg_tpu.ops.structured_transfer import StructuredTransfer

try:
    from jax import shard_map as _shard_map
except ImportError:                         # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


@dataclasses.dataclass
class SpmdVcycle:
    """Jitted V-cycle over slab-sharded grid vectors."""

    mesh: Mesh
    grid_shape: tuple              # padded (gz_pad, ny, nx)
    orig_grid: tuple
    fn: object                     # (b_grid, x_grid) -> x_grid (jitted)

    def to_grid(self, v_flat):
        g = np.zeros(self.grid_shape, dtype=np.asarray(v_flat).dtype)
        g[: self.orig_grid[0]] = np.asarray(v_flat).reshape(self.orig_grid)
        return jax.device_put(jnp.asarray(g), NamedSharding(self.mesh, P("x")))

    def from_grid(self, g):
        return np.asarray(g)[: self.orig_grid[0]].reshape(-1)


def build_spmd_vcycle(hier, n_devices: int | None = None, devices=None) -> SpmdVcycle:
    """Build the sharded V-cycle from a 2-level stencil-path 3D Hierarchy
    (Config(operator="stencil"), dense direct coarse solver)."""
    from mfmg_tpu.parallel.sharding import make_mesh
    from mfmg_tpu.solve.coarse import DirectCoarseSolver
    from mfmg_tpu.solve.smoothers import ChebyshevSmoother, JacobiSmoother

    lvl0 = hier.levels[0]
    if not isinstance(lvl0.op, StencilOperator) or lvl0.transfer is None:
        raise ValueError("SPMD V-cycle needs the stencil operator + structured transfer")
    if not isinstance(hier.levels[-1].coarse, DirectCoarseSolver):
        raise ValueError("SPMD V-cycle needs the direct coarse solver")

    mesh = make_mesh(n_devices, devices)
    Pn = int(mesh.devices.size)
    op: StencilOperator = lvl0.op
    tr: StructuredTransfer = lvl0.transfer
    sm = lvl0.smoother
    # levels >= 1 run replicated per device (they are tiny relative to the
    # fine grid: one agglomerate-grid dof per s^dim fine nodes); only the
    # 2-level case reduces to the bare inverse matvec.
    levels_rest = tuple(hier.levels[1:])
    inv = hier.levels[-1].coarse.inv
    dtype = op.coeffs.dtype

    import itertools

    dim = len(op.grid_shape)
    if dim not in (2, 3):
        raise ValueError("SPMD V-cycle supports 2D and 3D grids")
    gz = op.grid_shape[0]                       # slab axis (z in 3D, y in 2D)
    rest_grid = op.grid_shape[1:]
    k = max(max(abs(o) for o in off) for off in op.offsets)
    naz = tr.agg_shape[0]
    rest_agg = tr.agg_shape[1:]
    wz = tr.window_shape[0]
    sz = wz - 1
    strides = tuple(w - 1 for w in tr.window_shape)
    n_ev = tr.n_ev

    # window-aligned padded slab layout (see module docstring)
    naz_pad = Pn * (-(-naz // Pn))
    if naz_pad * sz < gz:                      # final real plane must fit
        naz_pad += Pn
    gz_pad = naz_pad * sz
    naz_loc = naz_pad // Pn
    nz_loc = naz_loc * sz

    def padz(arr, axis):
        pw = [(0, 0)] * arr.ndim
        pw[axis] = (0, gz_pad - arr.shape[axis])
        return jnp.pad(arr, pw)

    coeffs_p = padz(op.coeffs, 1)
    inv_diag_p = padz(sm.inv_diag.reshape(op.grid_shape), 0)
    W_pad = jnp.pad(tr.W, [(0, 0)] * (1 + dim)
                    + [(0, naz_pad - naz)] + [(0, 0)] * (dim - 1))

    shard3 = P(*(("x",) + (None,) * (dim - 1)))
    spec_coeff = P(*((None, "x") + (None,) * (dim - 1)))
    spec_W = P(*((None,) * (1 + dim) + ("x",) + (None,) * (dim - 1)))
    smap = partial(_shard_map, mesh=mesh)

    # ------------------------------------------------------------- apply --
    def _halo(x_loc, width):
        up = jax.lax.ppermute(x_loc[-width:], "x", [(i, i + 1) for i in range(Pn - 1)])
        down = jax.lax.ppermute(x_loc[:width], "x", [(i, i - 1) for i in range(1, Pn)])
        return jnp.concatenate([up, x_loc, down], axis=0)

    def apply_loc(c_loc, x_loc):
        x_ext = _halo(x_loc, k)
        xp = jnp.pad(x_ext, ((0, 0),) + ((k, k),) * (dim - 1))
        terms = None
        for i, off in enumerate(op.offsets):
            sl = (slice(k + off[0], k + off[0] + nz_loc),) + tuple(
                slice(k + o, k + o + g) for o, g in zip(off[1:], rest_grid))
            t = c_loc[i] * xp[sl]
            terms = t if terms is None else terms + t
        return terms

    @jax.jit
    def apply_fn(coeffs, x):
        return smap(apply_loc, in_specs=(spec_coeff, shard3), out_specs=shard3)(coeffs, x)

    # --------------------------------------------------------- restriction --
    def restrict_loc(W_loc, x_loc):
        # one halo plane from the slab above (windows close on its first row)
        top = jax.lax.ppermute(x_loc[:1], "x", [(i, i - 1) for i in range(1, Pn)])
        x_ext = jnp.concatenate([x_loc, top], axis=0)
        out = jnp.zeros((n_ev, naz_loc) + rest_agg, dtype=x_loc.dtype)
        for t in itertools.product(*[range(w) for w in tr.window_shape]):
            sl = (slice(t[0], t[0] + sz * (naz_loc - 1) + 1, sz),) + tuple(
                slice(td, td + sd * (ad - 1) + 1, sd)
                for td, sd, ad in zip(t[1:], strides[1:], rest_agg))
            xs = x_ext[sl]
            out = out + W_loc[(slice(None),) + t] * xs[None]
        return out

    @jax.jit
    def restrict_fn(W, x):
        loc = smap(restrict_loc, in_specs=(spec_W, shard3),
                   out_specs=P(*((None, "x") + (None,) * (dim - 1))))(W, x)
        full = jax.lax.with_sharding_constraint(loc, NamedSharding(mesh, P()))
        # real agglomerates only, (a_slab, ..., e) flat order
        return jnp.moveaxis(full[:, :naz], 0, -1).reshape(-1)

    # Prolongation = R^T is generated inside vcycle_fn via linear_transpose
    # of the sharded restriction with W as a traced ARGUMENT — closing over
    # W_pad would embed a constant that, under jax.distributed, can span
    # non-addressable devices (multi-process jit forbids that).

    # ------------------------------------------------------------ smoother --
    if isinstance(sm, ChebyshevSmoother):
        theta, delta, degree = sm.theta, sm.delta, sm.degree

        def smooth(coeffs, b, x):
            src = apply_fn(coeffs, x) - b
            xx = jnp.zeros_like(src)
            r = src
            p = None
            alpha = None
            for i in range(1, degree + 1):
                z = inv_diag_p * r
                if i == 1:
                    p, alpha = z, 1.0 / theta
                else:
                    beta = (delta * alpha / 2.0) ** 2
                    alpha = 1.0 / (theta - beta / alpha)
                    p = z + beta * p
                xx = xx + alpha * p
                if i < degree:
                    r = src - apply_fn(coeffs, xx)
            return x - xx
    elif isinstance(sm, JacobiSmoother):
        omega = sm.omega

        def smooth(coeffs, b, x):
            return x - omega * inv_diag_p * (apply_fn(coeffs, x) - b)
    else:
        raise ValueError("SPMD V-cycle supports Jacobi/Chebyshev smoothers")

    n_smooth = hier.config.smoother.n_smoothing_steps
    cycle_type = hier.config.cycle_type

    @jax.jit
    def vcycle_fn(coeffs, W, rest, b, x):
        from mfmg_tpu.amge.hierarchy import _cycle
        restrict_T = jax.linear_transpose(
            lambda v: restrict_fn(W, v),
            jax.ShapeDtypeStruct((gz_pad,) + rest_grid, dtype))
        for _ in range(n_smooth):
            x = smooth(coeffs, b, x)
        res = apply_fn(coeffs, x) - b
        bc = restrict_fn(W, res)
        if len(rest) == 1:
            xc = rest[0].coarse.apply(bc)
        else:
            # coarser AMGe levels, replicated on every device
            xc = _cycle(rest, bc, jnp.zeros_like(bc), 0, n_smooth, cycle_type)
        (corr,) = restrict_T(xc)
        x = x - corr
        for _ in range(n_smooth):
            x = smooth(coeffs, b, x)
        return x

    return SpmdVcycle(mesh=mesh, grid_shape=(gz_pad,) + rest_grid,
                      orig_grid=op.grid_shape,
                      fn=partial(vcycle_fn, coeffs_p, W_pad, levels_rest))
