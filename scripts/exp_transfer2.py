"""Experiment: transfer (restrict/prolong) formulation shootout at 129^3.

Current corner-subset einsum formulation measured 5.1 ms round-trip at 2.1M —
20x off the ~0.25 ms bandwidth bound (x 8.6 MB + W 33 MB).  Candidates:
  A. current structured_restrict / structured_prolong
  B. batched dot_general with agglomerate-major pre-transposed weights
  C. conv_general_dilated_patches im2col + flat multiply-reduce
  D. B with bf16 weights
"""

import os
import sys
import time
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
    xc = jnp.asarray(rng.uniform(size=nc).astype(np.float32))

    # ---- variant B: agglomerate-major weights ---------------------------
    # Wb[az, ay, ax, t(125), e]  (one host transpose at setup)
    Wb = jnp.asarray(
        np.transpose(np.asarray(W).reshape((n_ev, 125) + na), (2, 3, 4, 1, 0))
        .copy())

    def patches(xv):
        """(az, ay, ax, 125) block patches via 8 shifted views of the padded
        block decomposition (pure reshapes/slices, no gather)."""
        xg = xv.reshape(grid)
        xp = jnp.pad(xg, [(0, (a + 1) * s - g) for a, g in zip(na, grid)])
        xb = xp.reshape(na[0] + 1, s, na[1] + 1, s, na[2] + 1, s)
        xb = xb.transpose(0, 2, 4, 1, 3, 5)        # (bz, by, bx, tz, ty, tx)
        P = jnp.zeros(na + window, dtype=xv.dtype)
        import itertools
        for S in itertools.product(*[(0, 1)] * 3):
            src = xb[tuple(slice(1, na[d] + 1) if S[d] else slice(0, na[d])
                           for d in range(3))]
            src = src[(slice(None),) * 3 + tuple(
                slice(0, 1) if S[d] else slice(None) for d in range(3))]
            dst = (slice(None),) * 3 + tuple(
                slice(s, s + 1) if S[d] else slice(0, s) for d in range(3))
            P = P.at[dst].set(src)
        return P.reshape(na + (125,))

    def restrict_B(xv):
        P = patches(xv)
        out = jax.lax.dot_general(P, Wb, (((3,), (3,)), ((0, 1, 2), (0, 1, 2))))
        return out.reshape(-1)                     # (az, ay, ax, e) flat

    def prolong_B(xcv):
        xcg = xcv.reshape(na + (n_ev,))
        C = jax.lax.dot_general(xcg, Wb, (((3,), (4,)), ((0, 1, 2), (0, 1, 2))))
        # C: (az, ay, ax, 125) -> overlap-add back to grid
        C6 = C.reshape(na + window)
        D = jnp.zeros((na[0] + 1, na[1] + 1, na[2] + 1, s, s, s), dtype=xcv.dtype)
        import itertools
        for S in itertools.product(*[(0, 1)] * 3):
            t_sel = tuple(slice(s, s + 1) if S[d] else slice(0, s)
                          for d in range(3))
            piece = C6[(slice(None),) * 3 + t_sel]
            # shift by one block along axes in S (pad block axes only)
            padb = [((1, 0) if S[d] else (0, 1)) for d in range(3)]
            piece = jnp.pad(piece, padb + [(0, 0)] * 3)
            sel = (slice(None),) * 3 + tuple(
                slice(0, 1) if S[d] else slice(None) for d in range(3))
            D = D.at[sel].add(piece)
        Dt = D.transpose(0, 3, 1, 4, 2, 5)
        y = Dt.reshape((na[0] + 1) * s, (na[1] + 1) * s, (na[2] + 1) * s)
        return y[tuple(slice(0, g) for g in grid)].reshape(-1)

    # correctness vs A
    yA = np.asarray(structured_restrict(tr, x))
    # A layout: (az, ay, ax, e)?  structured_restrict returns transpose(perm)
    yB = np.asarray(restrict_B(x))
    log("restrict B rel err:", np.abs(yA - yB).max() / np.abs(yA).max())
    pA = np.asarray(structured_prolong(tr, xc))
    pB = np.asarray(prolong_B(xc))
    log("prolong B rel err:", np.abs(pA - pB).max() / np.abs(pA).max())

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

    import jax.numpy as jnp2

    def squeeze(fn):
        # keeps the carry shape while forcing fn to execute each iteration
        return lambda v: v * jax.lax.rsqrt(
            jnp2.vdot(fn(v), fn(v)).real * 0 + jnp2.vdot(v, v).real + 1e-30)             + 1e-12 * jnp2.sum(fn(v))

    def once(fn):
        return lambda v: v * jax.lax.rsqrt(
            jnp2.vdot(v, v).real + 1e-30) + 1e-12 * jnp2.sum(fn(v))

    rt = lambda v: structured_prolong(tr, structured_restrict(tr, v))
    two_point(rt, "A restrict+prolong", n)
    two_point(once(lambda v: structured_restrict(tr, v)), "A restrict", n)
    two_point(once(lambda v: structured_prolong(tr, v[:nc])), "A prolong", n)
    two_point(lambda v: prolong_B(restrict_B(v)), "B restrict+prolong", n)
    two_point(once(restrict_B), "B restrict", n)
    two_point(once(lambda v: prolong_B(v[:nc])), "B prolong", n)

    Wb16 = Wb.astype(jnp.bfloat16)

    def restrict_D(xv):
        P = patches(xv)
        out = jax.lax.dot_general(P, Wb16.astype(jnp.float32),
                                  (((3,), (3,)), ((0, 1, 2), (0, 1, 2))))
        return out.reshape(-1)

    two_point(restrict_D, "D restrict (bf16 W)", n)


if __name__ == "__main__":
    main()
