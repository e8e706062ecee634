"""Experiment: L0 structured transfer — precomputed corner chunks vs current;
plus full V-cycle with the pallas fine apply enabled."""

import os
import sys
import time
import itertools
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
    levels = tuple(hier.levels)
    tr = levels[0].transfer
    n0 = levels[0].op.shape[0]

    # ---- corner-chunk precompute (host) --------------------------------
    dim = len(tr.agg_shape)
    s = tuple(w - 1 for w in tr.window_shape)
    na = tr.agg_shape
    corners = list(itertools.product(*[(0, 1)] * dim))
    Wc = []
    for S in corners:
        w_idx = tuple((slice(s[d], s[d] + 1) if S[d] else slice(0, s[d]))
                      for d in range(dim))
        Wp = np.asarray(tr.W[(slice(None),) + w_idx])  # (e, tz', ty', tx', az, ay, ax)
        # layout: (az,ay,ax) batch, contract (tz ty tx), out e
        m = int(np.prod(Wp.shape[1:1 + dim]))
        Wp2 = Wp.reshape(tr.n_ev, m, -1)               # (e, m, B)
        Wp2 = np.moveaxis(Wp2, 2, 0).copy()            # (B, e, m)
        Wc.append(jnp.asarray(Wp2, dtype=jnp.float32))
    Wc = tuple(Wc)

    def restrict_chunks(Wc, x):
        xg = x.reshape(tr.grid_shape)
        xp = jnp.pad(xg, [(0, (a + 1) * sd - g)
                          for a, sd, g in zip(na, s, tr.grid_shape)])
        shape6 = []
        for a, sd in zip(na, s):
            shape6 += [a + 1, sd]
        xb = xp.reshape(shape6)
        out = None
        for ci, S in enumerate(corners):
            xb_idx = []
            for d in range(dim):
                if S[d]:
                    xb_idx += [slice(1, na[d] + 1), slice(0, 1)]
                else:
                    xb_idx += [slice(0, na[d]), slice(None)]
            xs = xb[tuple(xb_idx)]
            # (bz,tz',by,ty',bx,tx') -> (B, m)
            perm = (0, 2, 4, 1, 3, 5)
            xs = xs.transpose(perm).reshape(int(np.prod(na)), -1)
            t = jnp.einsum("bem,bm->be", Wc[ci], xs)
            out = t if out is None else out + t
        return out.reshape(-1)     # (B, e) flat = (az,ay,ax,e) order ✓

    x = jnp.asarray(np.random.default_rng(0).uniform(size=n0).astype(np.float32))
    y_ref = np.asarray(tr.restrict(x))
    y_new = np.asarray(restrict_chunks(Wc, x))
    log("chunks restrict rel err:", np.abs(y_ref - y_new).max() / np.abs(y_ref).max())

    nct = tr.n_ev * int(np.prod(na))
    restrict_T = jax.linear_transpose(lambda v: restrict_chunks(Wc, v),
                                      jax.ShapeDtypeStruct((n0,), jnp.float32))
    xc = jnp.asarray(np.random.default_rng(1).uniform(size=nct).astype(np.float32))
    p_ref = np.asarray(tr.prolong(xc))
    (p_new,) = restrict_T(xc)
    log("chunks prolong rel err:", np.abs(p_ref - np.asarray(p_new)).max() / np.abs(p_ref).max())

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
                log(f"{label:<30} {dt*1e3:8.4f} ms")
                return dt
        log(label, "TIMING FAILED")

    two_point(lambda v: tr.prolong(tr.restrict(v)), n0, "current r+p")

    def rp_chunks(v):
        (y,) = restrict_T(restrict_chunks(Wc, v))
        return y

    two_point(rp_chunks, n0, "corner-chunk r+p")

    from mfmg_tpu.amge.hierarchy import _vcycle
    nss = cfg.smoother.n_smoothing_steps
    two_point(lambda v: _vcycle(levels, jnp.zeros_like(v), v, 0, nss, False),
              n0, "full V-cycle (pallas apply)")


if __name__ == "__main__":
    main()
