"""Two-point timing of individual V-cycle components on the real TPU.

Each component runs as its own jitted lax.fori_loop program at two trip
counts; per-iteration time = slope (see bench.py for why per-call timing is
meaningless on the tunneled runtime).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "6"))
LEVELS = int(os.environ.get("MFMG_BENCH_LEVELS", "3"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import AgglomerationConfig, CoarseConfig, SmootherConfig
    from mfmg_tpu.solve.operator import apply_op

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=LEVELS,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    levels = tuple(hier.levels)
    log(f"n_dofs={prob.n_dofs} levels={len(levels)}")

    rng = np.random.default_rng(0)

    def fresh(n):
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, n_elems, label):
        @partial(jax.jit, static_argnames=("n",))
        def loop(levels, x, n):
            def body(i, v):
                v = fn(levels, v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        def timed(n):
            v = fresh(n_elems)
            t0 = time.perf_counter()
            out = loop(levels, v, n)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        timed(5), timed(50)
        for _ in range(5):
            t_lo, t_hi = timed(5), timed(50)
            if 0 < t_lo < t_hi:
                dt = (t_hi - t_lo) / 45
                log(f"{label:<28} {dt*1e3:8.4f} ms")
                return dt
        log(f"{label}: TIMING FAILED")
        return float("nan")

    lvl0, lvl1 = levels[0], levels[1]
    n0 = lvl0.op.shape[0]
    n1 = lvl1.op.shape[0]
    nc = levels[-1].op.shape[0]

    # fine pieces
    two_point(lambda L, v: L[0].op @ v, n0, "L0 stencil apply")
    two_point(lambda L, v: L[0].smoother.apply(L[0].op, jnp.zeros_like(v), v),
              n0, "L0 chebyshev(2) smooth")
    two_point(lambda L, v: L[0].transfer.prolong(L[0].transfer.restrict(v)),
              n0, "L0 restrict+prolong")
    if len(levels) > 2:
        two_point(lambda L, v: L[1].op @ v, n1, "L1 block-stencil apply")
        two_point(lambda L, v: L[1].smoother.apply(L[1].op, jnp.zeros_like(v), v),
                  n1, "L1 chebyshev(2) smooth")
        two_point(lambda L, v: L[1].transfer.prolong(L[1].transfer.restrict(v)),
                  n1, "L1 restrict+prolong")
    two_point(lambda L, v: L[-1].coarse.apply(v), nc, "coarse direct")

    from mfmg_tpu.amge.hierarchy import _vcycle
    nss = cfg.smoother.n_smoothing_steps
    two_point(lambda L, v: _vcycle(L, jnp.zeros_like(v), v, 0, nss, False),
              n0, "full V-cycle")


if __name__ == "__main__":
    main()
