"""Round-5 stage profile at 129^3: fused vs unfused smoother, transfer pair,
fused windowed sub-cycle vs generic L1 recursion.  Two-point loops."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "7"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                                 EigensolverConfig, SmootherConfig)

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 coeff_dtype="bfloat16",
                 eigensolver=EigensolverConfig(n_eigenvectors=2,
                                               n_eigenvectors_deep=4),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    t0 = time.perf_counter()
    hier = Hierarchy(prob, cfg)
    log(f"setup {time.perf_counter()-t0:.0f}s; smoother "
        f"{type(hier.levels[0].smoother).__name__}")
    levels = tuple(hier.levels)

    def fresh(n):
        v = jnp.asarray(np.random.default_rng(
            int.from_bytes(os.urandom(4), "little")).uniform(
                size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, n_elems, label, n_lo=5, n_hi=40):
        @partial(jax.jit, static_argnames=("n",))
        def loop(levels, x, n):
            def body(i, v):
                v = fn(levels, v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        def timed(n):
            v = fresh(n_elems)
            t1 = time.perf_counter()
            out = loop(levels, v, n)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t1

        tc0 = time.perf_counter()
        timed(n_lo), timed(n_hi)
        tc = time.perf_counter() - tc0
        for _ in range(5):
            t_lo, t_hi = timed(n_lo), timed(n_hi)
            if 0 < t_lo < t_hi:
                dt = (t_hi - t_lo) / (n_hi - n_lo)
                log(f"{label:<30} {dt*1e3:8.4f} ms   (compile {tc:.0f}s)")
                return dt
        log(f"{label}: TIMING FAILED")
        return float("nan")

    l0, l1 = levels[0], levels[1]
    n0, n1 = l0.op.shape[0], l1.op.shape[0]
    sm_plain = (l0.smoother.to_plain()
                if hasattr(l0.smoother, "to_plain") else l0.smoother)

    # stage order: cheapest compiles first
    two_point(lambda L, v: L[0].op @ v, n0, "L0 tiled-sym apply")
    two_point(lambda L, v: L[0].transfer.prolong(L[0].transfer.restrict(v)),
              n0, "L0 restrict+prolong")

    from mfmg_tpu.amge.hierarchy import _cycle

    def gen_l1(L, v):
        return _cycle((L[1], L[2]), v, jnp.zeros_like(v), 0, 1, "v")

    two_point(gen_l1, n1, "L1 generic sub-cycle")

    from mfmg_tpu.ops.fused_cycle import fused_subcycle_apply
    if l0.fused is not None:
        two_point(lambda L, v: fused_subcycle_apply(L[0].fused, v), n1,
                  "L1 fused windowed sub-cycle")

    two_point(lambda L, v: sm_plain.apply(L[0].op, jnp.zeros_like(v), v),
              n0, "L0 unfused cheb smooth")
    if hasattr(l0.smoother, "apply_with_residual"):
        two_point(lambda L, v: L[0].smoother.apply_with_residual(
            L[0].op, jnp.zeros_like(v), v)[0], n0, "L0 fused smooth(+res)")


if __name__ == "__main__":
    main()
