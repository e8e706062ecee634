"""Standalone TPU timing: z-tiled Pallas transfer pair vs the XLA chain at
129^3 (random weights — timing only, correctness is covered by CPU tests)."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from mfmg_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mfmg_tpu.ops.pallas_transfer import (build_transfer_tiled, tiled_prolong,
                                          tiled_restrict)
from mfmg_tpu.ops.structured_transfer import (StructuredTransfer,
                                              structured_prolong,
                                              structured_restrict)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 32   # agg per axis
    s, c = 4, 2
    grid = (g * s + 1,) * 3
    rng = np.random.default_rng(0)
    W = rng.standard_normal((c, s + 1, s + 1, s + 1, g, g, g)).astype(
        np.float32)
    tr = StructuredTransfer(W=jnp.asarray(W), window_shape=(s + 1,) * 3,
                            agg_shape=(g,) * 3, grid_shape=grid)
    ops = build_transfer_tiled(tr, reduced=True)
    log(f"grid {grid}; AZT {ops.AZT} TZF {ops.TZF} tiles {ops.n_tiles}")
    n = int(np.prod(grid))
    nc = c * g ** 3

    def fresh(m):
        v = jnp.asarray(np.random.default_rng(
            int.from_bytes(__import__("os").urandom(4), "little"))
            .standard_normal(m).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, m, label, n_lo=20, n_hi=200):
        @partial(jax.jit, static_argnames=("k",))
        def loop(v, k):
            def body(i, v):
                v = fn(v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, k, body, v)

        def timed(k):
            v = fresh(m)
            t0 = time.perf_counter()
            out = loop(v, k)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(n_lo), timed(n_hi)
        tc = time.perf_counter() - t0
        sl = []
        for _ in range(6):
            tl, th = timed(n_lo), timed(n_hi)
            if 0 < tl < th:
                sl.append((th - tl) / (n_hi - n_lo))
            if len(sl) >= 3:
                break
        log(f"{label:<28} {np.median(sl)*1e3:8.4f} ms  (compile {tc:.0f}s)")

    two_point(lambda v: tiled_prolong(ops, tiled_restrict(ops, v)), n,
              "tiled restrict+prolong")
    two_point(lambda v: structured_prolong(tr, structured_restrict(tr, v)), n,
              "XLA restrict+prolong")


if __name__ == "__main__":
    main()
