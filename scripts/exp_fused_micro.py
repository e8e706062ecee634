"""Micro-timing: fused subcycle kernel alone vs XLA recursion alone."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import _cycle
    from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                                 EigensolverConfig, SmootherConfig)
    from mfmg_tpu.ops.fused_cycle import (build_fused_subcycle,
                                          fused_correction_apply,
                                          fused_subcycle_apply)

    prob = LaplaceProblem.hyper_cube(3, 6, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 coeff_dtype="bfloat16",
                 eigensolver=EigensolverConfig(n_eigenvectors=2,
                                               n_eigenvectors_deep=4),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    levels = tuple(hier.levels)
    fs = build_fused_subcycle(levels, 1)
    n1 = levels[1].op.shape[0]

    @partial(jax.jit, static_argnames=("n", "mode"))
    def loop(levels, fs, b, n, mode):
        def body(i, x):
            if mode == "fused":
                y = fused_subcycle_apply(fs, x)
                return y / (jnp.linalg.norm(y) + 1e-30)
            if mode == "xla":
                y = _cycle(levels, x, jnp.zeros_like(x), 1, 1, "v")
                return y / (jnp.linalg.norm(y) + 1e-30)
            if mode == "tail":
                y = fused_correction_apply(fs, x, x)
                return y / (jnp.linalg.norm(y) + 1e-30)
            if mode == "smoother":
                y = levels[0].smoother.apply(levels[0].op, x, x)
                return y / (jnp.linalg.norm(y) + 1e-30)
            if mode == "residual":
                from mfmg_tpu.solve.operator import apply_op
                y = apply_op(levels[0].op, x)
                return y / (jnp.linalg.norm(y) + 1e-30)
            if mode == "transfer":   # L0 restrict+prolong pair alone
                lvl = levels[0]
                y = lvl.transfer.restrict(x)
                z = lvl.transfer.prolong(y)[:x.shape[0]]
                return z / (jnp.linalg.norm(z) + 1e-30)
        return jax.lax.fori_loop(0, n, body, b)

    def _fresh(n):
        import os
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def timed(mode, n, size):
        v = _fresh(size)
        t0 = time.perf_counter()
        out = loop(levels, fs, v, n, mode)
        assert not np.isnan(float(jnp.vdot(out, out)))
        return time.perf_counter() - t0

    for mode, size in (("fused", n1), ("xla", n1), ("transfer", prob.n_dofs),
                       ("tail", prob.n_dofs), ("smoother", prob.n_dofs),
                       ("residual", prob.n_dofs)):
        N_LO, N_HI = 50, 500
        timed(mode, N_LO, size); timed(mode, N_HI, size)
        slopes = []
        for _ in range(6):
            tl, th = timed(mode, N_LO, size), timed(mode, N_HI, size)
            if 0 < tl < th:
                slopes.append((th - tl) / (N_HI - N_LO))
            if len(slopes) >= 4:
                break
        print(f"{mode}: {np.median(slopes)*1e6:.1f} us")


if __name__ == "__main__":
    main()
