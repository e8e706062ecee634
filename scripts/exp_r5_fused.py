"""Round-5 A/B: 2.1M-dof cycle with the z-tiled fused Chebyshev smoother and
the windowed fused L1 sub-cycle vs the round-4 path (unfused 129^3 smoother,
generic L1 recursion) — same session, same hierarchy."""

import dataclasses
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.hierarchy import _vcycle
from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                             EigensolverConfig, SmootherConfig)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    t0 = time.perf_counter()
    prob = LaplaceProblem.hyper_cube(3, n_ref, material_property="linear")
    cfg = Config(max_levels=3, operator="stencil", dtype="float32",
                 coeff_dtype="bfloat16",
                 eigensolver=EigensolverConfig(n_eigenvectors=2,
                                               n_eigenvectors_deep=4),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    log(f"setup {time.perf_counter()-t0:.1f}s n={prob.n_dofs}")
    l0 = hier.levels[0]
    log(f"smoother: {type(l0.smoother).__name__}, fused: "
        f"{type(l0.fused).__name__ if l0.fused is not None else None}, "
        f"fine_grid: {getattr(l0.fused, 'fine_grid', '-')}")

    levels_new = tuple(hier.levels)
    sm_prev = getattr(hier, "_unfused_smoother0", None)
    tr_old = l0.transfer
    if getattr(tr_old, "tiled", None) is not None:
        tr_old = dataclasses.replace(tr_old, tiled=None)
    levels_old = (dataclasses.replace(l0, fused=None, transfer=tr_old,
                                      smoother=sm_prev or l0.smoother),
                  ) + levels_new[1:]
    nss = cfg.smoother.n_smoothing_steps

    @partial(jax.jit, static_argnames=("n",))
    def cycles(levels, b, x, n):
        def body(i, x):
            return _vcycle(levels, b, x, 0, nss, False)
        return jax.lax.fori_loop(0, n, body, x)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))

    # correctness: one cycle old vs new (bf16 transfer passes differ slightly)
    x0 = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    y_new = _vcycle(levels_new, b, x0, 0, nss, False)
    y_old = _vcycle(levels_old, b, x0, 0, nss, False)
    rel = float(jnp.linalg.norm(y_new - y_old) / jnp.linalg.norm(y_old))
    log(f"one-cycle rel diff new vs old: {rel:.2e}")

    import os

    def fresh():
        v = jnp.asarray(np.random.default_rng(
            int.from_bytes(os.urandom(4), "little")).uniform(
                size=prob.n_dofs).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def timed(levels, n):
        v = fresh()
        t1 = time.perf_counter()
        out = cycles(levels, b, v, n)
        assert np.isfinite(float(jnp.vdot(out, out)))
        return time.perf_counter() - t1

    def two_point(levels, n_lo, n_hi):
        timed(levels, n_lo), timed(levels, n_hi)
        slopes = []
        for _ in range(8):
            tl, th = timed(levels, n_lo), timed(levels, n_hi)
            if 0 < tl < th:
                slopes.append((th - tl) / (n_hi - n_lo))
            if len(slopes) >= 4:
                break
        return float(np.median(slopes))

    N_LO, N_HI = 10, 60
    dt_new = two_point(levels_new, N_LO, N_HI)
    dt_old = two_point(levels_old, N_LO, N_HI)
    log(f"NEW: {dt_new*1e3:.3f} ms/cycle  ({prob.n_dofs/dt_new:.3e} DoF/s)")
    log(f"OLD: {dt_old*1e3:.3f} ms/cycle  -> speedup {dt_old/dt_new:.2f}x")

    xs, info = hier.solve_cg(b, tol=1e-5, maxiter=50)
    log(f"pcg: {int(info['iterations'])} iters, relres "
        f"{float(info['relres']):.2e}")


if __name__ == "__main__":
    main()
