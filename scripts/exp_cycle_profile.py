"""Experiment: component-level timing of the 2.1M V-cycle on the real TPU.

Answers "where do the ~8-10 ms/cycle go" — fine op applies are only ~1.7 ms
of it (5 applies x 0.34 ms bf16).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "7"))
COEFF = os.environ.get("MFMG_COEFF_DTYPE", "bfloat16")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import _cycle
    from mfmg_tpu.config import AgglomerationConfig, CoarseConfig, SmootherConfig
    from mfmg_tpu.solve.operator import apply_op

    t0 = time.perf_counter()
    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    cfg = Config(max_levels=3, operator="stencil", dtype="float32",
                 coeff_dtype=COEFF,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    log(f"setup {time.perf_counter()-t0:.0f}s")
    levels = tuple(hier.levels)
    L0 = levels[0]
    n = prob.n_dofs
    n1 = levels[1].op.shape[0]

    def two_point(make_loop, label, m=1):
        @partial(jax.jit, static_argnames=("k",))
        def loop(v, k):
            return jax.lax.fori_loop(0, k, make_loop, v)

        def timed(k):
            sz = jax.eval_shape(lambda v: make_loop(0, v),
                                jax.ShapeDtypeStruct((m,), jnp.float32))
            seed = int.from_bytes(os.urandom(4), "little")
            v = jnp.asarray(np.random.default_rng(seed).uniform(
                size=m).astype(np.float32))
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

    norm = lambda v: v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
    b = jnp.asarray(np.random.default_rng(0).uniform(size=n).astype(np.float32))
    b1 = jnp.asarray(np.random.default_rng(0).uniform(size=n1).astype(np.float32))

    two_point(lambda i, v: norm(apply_op(L0.op, v)), "L0 op apply", n)
    two_point(lambda i, v: norm(L0.smoother.apply(L0.op, b, v)),
              "L0 smoother.apply (cheb d2)", n)
    from mfmg_tpu.amge.hierarchy import _restrict, _prolong

    def rp(i, v):
        return norm(_prolong(levels[0], _restrict(levels[0], v)))

    two_point(rp, "restrict+prolong L0", n)

    def sub(i, v):
        return norm(_cycle(levels, v, jnp.zeros_like(v), 1, 1, "v"))

    two_point(sub, "L1+L2 subtree", n1)

    def full(i, v):
        return norm(_cycle(levels, b, v, 0, 1, "v"))

    two_point(full, "full vcycle", n)


if __name__ == "__main__":
    main()
