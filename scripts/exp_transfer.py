"""Experiment: level-1 transfer implementations (conv-patches vs dense vs
gather) timed on the real TPU at the bench config."""

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
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    tr = hier.levels[1].transfer
    n_in_total = tr.n_in * int(np.prod(tr.in_grid))
    n_out_total = tr.n_out * int(np.prod(tr.out_grid))
    log(f"L1 transfer: {n_out_total} x {n_in_total}")

    # dense R from the existing restrict (exact linearization via W layout)
    # Build dense R on host from W directly: R[(S,e_out), (B,e_in)]
    import itertools
    dim = len(tr.in_grid)
    W = np.asarray(tr.W, dtype=np.float64)   # (n_out, *win, n_in, *out_grid)
    nt = int(np.prod(tr.window_shape))
    R = np.zeros((n_out_total, n_in_total))
    out_dims = tr.out_grid
    in_dims = tr.in_grid
    for S in itertools.product(*[range(n) for n in out_dims]):
        S_flat = np.ravel_multi_index(S, out_dims)
        for t in itertools.product(*[range(w) for w in tr.window_shape]):
            B = tuple(S[d] * tr.stride[d] + tr.t0[d] + t[d] for d in range(dim))
            if any(b < 0 or b >= in_dims[d] for d, b in enumerate(B)):
                continue
            B_flat = np.ravel_multi_index(B, in_dims)
            for eo in range(tr.n_out):
                for ei in range(tr.n_in):
                    R[S_flat * tr.n_out + eo, B_flat * tr.n_in + ei] = \
                        W[(eo,) + t + (ei,) + S]
    Rd = jnp.asarray(R, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=n_in_total).astype(np.float32))
    # correctness
    y_conv = np.asarray(tr.restrict(x))
    y_dense = np.asarray(Rd @ x)
    log("dense vs conv restrict max err:", np.abs(y_conv - y_dense).max())
    xc = jnp.asarray(rng.uniform(size=n_out_total).astype(np.float32))
    p_conv = np.asarray(tr.prolong(xc))
    p_dense = np.asarray(Rd.T @ xc)
    log("dense vs conv prolong max err:", np.abs(p_conv - p_dense).max())

    def fresh(n):
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, n_elems, label):
        @partial(jax.jit, static_argnames=("n",))
        def loop(x, n):
            def body(i, v):
                v = fn(v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        def timed(n):
            v = fresh(n_elems)
            t0 = time.perf_counter()
            out = loop(v, n)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        timed(5), timed(50)
        for _ in range(5):
            t_lo, t_hi = timed(5), timed(50)
            if 0 < t_lo < t_hi:
                dt = (t_hi - t_lo) / 45
                log(f"{label:<34} {dt*1e3:8.4f} ms")
                return dt
        log(f"{label}: TIMING FAILED")

    two_point(lambda v: tr.prolong(tr.restrict(v)), n_in_total,
              "conv-patches restrict+prolong")
    two_point(lambda v: Rd.T @ (Rd @ v), n_in_total,
              "dense restrict+prolong")

    # gather variant: X = x[idx] (n_S, nt*n_in), y = einsum
    idx = np.zeros((int(np.prod(out_dims)), nt, tr.n_in), dtype=np.int32)
    ok = np.zeros_like(idx, dtype=bool)
    for S in itertools.product(*[range(n) for n in out_dims]):
        S_flat = np.ravel_multi_index(S, out_dims)
        for ti, t in enumerate(itertools.product(*[range(w) for w in tr.window_shape])):
            B = tuple(S[d] * tr.stride[d] + tr.t0[d] + t[d] for d in range(dim))
            inside = all(0 <= b < in_dims[d] for d, b in enumerate(B))
            B_flat = np.ravel_multi_index([min(max(b, 0), in_dims[d]-1) for d, b in enumerate(B)], in_dims)
            for ei in range(tr.n_in):
                idx[S_flat, ti, ei] = B_flat * tr.n_in + ei
                ok[S_flat, ti, ei] = inside
    # Wg[S, e_out, nt*n_in]
    Wg = np.zeros((int(np.prod(out_dims)), tr.n_out, nt * tr.n_in))
    for S in itertools.product(*[range(n) for n in out_dims]):
        S_flat = np.ravel_multi_index(S, out_dims)
        for ti, t in enumerate(itertools.product(*[range(w) for w in tr.window_shape])):
            for eo in range(tr.n_out):
                for ei in range(tr.n_in):
                    Wg[S_flat, eo, ti * tr.n_in + ei] = W[(eo,) + t + (ei,) + S]
    Wg = Wg * ok.reshape(ok.shape[0], 1, -1)
    Wg_j = jnp.asarray(Wg, dtype=jnp.float32)
    idx_j = jnp.asarray(idx.reshape(idx.shape[0], -1))

    def g_restrict(v):
        X = v[idx_j]                                 # (n_S, nt*n_in)
        return jnp.einsum("sek,sk->se", Wg_j, X).reshape(-1)

    y_g = np.asarray(g_restrict(x))
    log("gather vs dense restrict max err:", np.abs(y_g - y_dense).max())

    g_restrict_T = jax.linear_transpose(g_restrict, jax.ShapeDtypeStruct((n_in_total,), jnp.float32))

    def g_prolong(vc):
        (y,) = g_restrict_T(vc)
        return y

    two_point(lambda v: g_prolong(g_restrict(v)), n_in_total,
              "gather restrict+prolong")


if __name__ == "__main__":
    main()
