"""Experiment: transfer variants round 2 — conv-patches (C) and
single-materialized-transpose (E) against the 3.9 ms baseline restrict."""

import os
import sys
import time
import itertools
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu.ops.structured_transfer import (
        StructuredTransfer, structured_restrict, structured_prolong)

    n_ev, s, na = 2, 4, (32, 32, 32)
    window = (s + 1,) * 3
    grid = tuple(a * s + 1 for a in na)
    n = int(np.prod(grid))
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.uniform(-1, 1, size=(n_ev,) + window + na)
                    .astype(np.float32))
    tr = StructuredTransfer(W=W, window_shape=window, agg_shape=na,
                            grid_shape=grid)
    x = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    nc = n_ev * int(np.prod(na))

    # ---- variant C: conv_general_dilated_patches -----------------------
    # Wc[t(125), az, ay, ax, e]
    Wc = jnp.asarray(np.transpose(
        np.asarray(W).reshape((n_ev, 125) + na), (1, 2, 3, 4, 0)).copy())

    def restrict_C(xv):
        xg = xv.reshape((1, 1) + grid)
        pat = jax.lax.conv_general_dilated_patches(
            xg, window, (s, s, s), [(0, s - 1)] * 3)
        pat = pat[0]                          # (125, 33, 33, 33) but na=32...
        pat = pat[:, :na[0], :na[1], :na[2]]
        out = jnp.einsum("tzyx,tzyxe->zyxe", pat, Wc)
        return out.reshape(-1)

    def restrict_C_lin(xv):
        return restrict_C(xv)

    prolong_C = jax.linear_transpose(restrict_C_lin, x)

    # ---- variant E: one materialized transpose + clean einsums ---------
    # We[e, az, ay, ax, tz, ty, tx] (blocked-major weights)
    We = jnp.asarray(np.moveaxis(
        np.asarray(W), (1, 2, 3), (4, 5, 6)).copy())   # (e, az.., t..)

    def restrict_E(xv):
        xg = xv.reshape(grid)
        xp = jnp.pad(xg, [(0, (a + 1) * s - g) for a, g in zip(na, grid)])
        xb = xp.reshape(na[0] + 1, s, na[1] + 1, s, na[2] + 1, s)
        xt = xb.transpose(0, 2, 4, 1, 3, 5)    # ONE hostile transpose, 9 MB
        out = jnp.zeros((n_ev,) + na, dtype=xv.dtype)
        for S in itertools.product(*[(0, 1)] * 3):
            b_idx = tuple(slice(1, na[d] + 1) if S[d] else slice(0, na[d])
                          for d in range(3))
            t_idx = tuple(slice(0, 1) if S[d] else slice(None)
                          for d in range(3))
            xs = xt[b_idx + t_idx]             # (az, ay, ax, tz', ty', tx')
            w_idx = tuple(slice(s, s + 1) if S[d] else slice(0, s)
                          for d in range(3))
            Wp = We[(slice(None),) * 4 + w_idx] if False else We[
                (slice(None), slice(None), slice(None), slice(None)) + w_idx]
            out = out + jnp.einsum("euvwijl,uvwijl->euvw", Wp, xs)
        return out.transpose(1, 2, 3, 0).reshape(-1)

    # correctness
    yA = np.asarray(structured_restrict(tr, x))
    for nm, f in [("C", restrict_C), ("E", restrict_E)]:
        y = np.asarray(f(x))
        log(f"restrict {nm} rel err:", np.abs(yA - y).max() / np.abs(yA).max())
    xcv = jnp.asarray(np.random.default_rng(1).uniform(size=nc)
                      .astype(np.float32))
    pA = np.asarray(structured_prolong(tr, xcv))
    pC = np.asarray(prolong_C(xcv)[0])
    log("prolong C rel err:", np.abs(pA - pC).max() / np.abs(pA).max())

    def two_point(fn, label, m):
        norm = lambda v: v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)

        @partial(jax.jit, static_argnames=("k",))
        def loop(v, k):
            return jax.lax.fori_loop(0, k, lambda i, v: norm(fn(v)), v)

        def timed(k):
            seed = int.from_bytes(os.urandom(4), "little")
            v = jnp.asarray(np.random.default_rng(seed).uniform(size=m)
                            .astype(np.float32))
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            out = loop(v, k)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        timed(3); timed(20)
        best = 1e9
        for _ in range(3):
            t_lo, t_hi = timed(3), timed(20)
            if 0 < t_lo < t_hi:
                best = min(best, (t_hi - t_lo) / 17)
        log(f"{label}: {best*1e3:.3f} ms")
        return best

    def once(fn):
        return lambda v: v * jax.lax.rsqrt(
            jnp.vdot(v, v).real + 1e-30) + 1e-12 * jnp.sum(fn(v))

    two_point(once(restrict_C), "C restrict (conv patches)", n)
    two_point(once(restrict_E), "E restrict (one transpose)", n)
    two_point(once(lambda v: prolong_C(v[:nc])[0]), "C prolong (transpose)", n)


if __name__ == "__main__":
    main()
