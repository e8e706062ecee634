"""Experiment: L0 structured transfer as ONE strided im2col conv + einsum
(f32-forced precision), vs the 8-corner einsum path."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "6"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import AgglomerationConfig, CoarseConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=2,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    tr = hier.levels[0].transfer
    n0 = hier.levels[0].op.shape[0]
    dim = len(tr.agg_shape)
    nt = int(np.prod(tr.window_shape))
    strides = tuple(w - 1 for w in tr.window_shape)
    nB = int(np.prod(tr.agg_shape))

    # W: (e, tz,ty,tx, az,ay,ax) -> Wk (e, nt, B)
    Wk = jnp.asarray(np.asarray(tr.W).reshape(tr.n_ev, nt, nB))

    # padding so conv output spatial == agg_shape
    pad = []
    for d in range(dim):
        hi = (tr.window_shape[d] - 1 + strides[d] * (tr.agg_shape[d] - 1)
              - (tr.grid_shape[d] - 1))
        pad.append((0, hi))

    def restrict_conv(Wk, x):
        xg = x.reshape((1, 1) + tr.grid_shape)
        pat = jax.lax.conv_general_dilated_patches(
            xg, filter_shape=tr.window_shape, window_strides=strides,
            padding=pad, precision=jax.lax.Precision.HIGHEST)
        pat = pat.reshape(nt, nB)
        out = jnp.einsum("etb,tb->be", Wk, pat,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(-1)

    x = jnp.asarray(np.random.default_rng(0).uniform(size=n0).astype(np.float32))
    y_ref = np.asarray(tr.restrict(x))
    y_new = np.asarray(restrict_conv(Wk, x))
    log("conv restrict rel err:", np.abs(y_ref - y_new).max() / np.abs(y_ref).max())

    restrict_T = jax.linear_transpose(lambda v: restrict_conv(Wk, v),
                                      jax.ShapeDtypeStruct((n0,), jnp.float32))
    nct = tr.n_ev * nB
    xc = jnp.asarray(np.random.default_rng(1).uniform(size=nct).astype(np.float32))
    p_ref = np.asarray(tr.prolong(xc))
    (p_new,) = restrict_T(xc)
    log("conv prolong rel err:", np.abs(p_ref - np.asarray(p_new)).max() / np.abs(p_ref).max())

    def fresh(n):
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, n_elems, label):
        @partial(jax.jit, static_argnames=("k",))
        def loop(x, k):
            def body(i, v):
                v = fn(v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, k, body, x)

        def timed(k):
            v = fresh(n_elems)
            t0 = time.perf_counter()
            out = loop(v, k)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        timed(5), timed(50)
        for _ in range(5):
            t_lo, t_hi = timed(5), timed(50)
            if 0 < t_lo < t_hi:
                dt = (t_hi - t_lo) / 45
                log(f"{label:<26} {dt*1e3:8.4f} ms")
                return dt
        log(label, "TIMING FAILED")

    two_point(lambda v: tr.prolong(tr.restrict(v)), n0, "corner-einsum r+p")

    def rp_conv(v):
        (y,) = restrict_T(restrict_conv(Wk, v))
        return y

    two_point(rp_conv, n0, "conv-im2col r+p")


if __name__ == "__main__":
    main()
