"""Experiment: fused coarse-tail kernel vs generic recursion (A/B).

Usage:
  python scripts/exp_fused.py --nref 4          # correctness
  python scripts/exp_fused.py --nref 6 --time   # TPU in-cycle A/B
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nref", type=int, default=4)
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import _cycle
    from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                                 EigensolverConfig, SmootherConfig)
    from mfmg_tpu.ops.fused_cycle import (build_fused_tail,
                                          fused_correction_apply,
                                          fused_subcycle_apply)
    from mfmg_tpu.solve.operator import apply_op

    prob = LaplaceProblem.hyper_cube(3, args.nref, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 coeff_dtype="bfloat16" if args.time else None,
                 eigensolver=EigensolverConfig(n_eigenvectors=2,
                                               n_eigenvectors_deep=4),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    levels = tuple(hier.levels)

    fs = build_fused_tail(levels, 1)
    assert fs is not None, "pattern match failed"
    print("fused built: grid", fs.grid, "c", fs.n_comp, "fine", fs.fine_grid,
          "Rdp", fs.Rdp.shape)

    n1 = levels[1].op.shape[0]
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.standard_normal(n1).astype(np.float32))

    # sub-cycle kernel vs generic recursion.  NOTE on TPU the generic path's
    # Rd @ x runs at default (bf16-pass) matmul precision, so ~1e-3 gaps are
    # ITS noise; on CPU this comparison is tight.
    x_ref = _cycle(levels, b1, jnp.zeros_like(b1), 1, 1, "v")
    x_sub = fused_subcycle_apply(fs, b1)
    err = float(jnp.linalg.norm(x_sub - x_ref) / jnp.linalg.norm(x_ref))
    tol = 1e-5 if jax.default_backend() == "cpu" else 5e-3
    print(f"subcycle vs _cycle rel err: {err:.3e}  (tol {tol})")
    assert err < tol, err

    # full tail: fused transfers vs XLA transfers around the SAME sub-cycle
    x_in = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    res = jnp.asarray(rng.standard_normal(prob.n_dofs).astype(np.float32))
    bc = levels[0].transfer.restrict(res)
    ref_tail = x_in - levels[0].transfer.prolong(fused_subcycle_apply(fs, bc))
    tail = fused_correction_apply(fs, x_in, res)
    err_t = float(jnp.linalg.norm(tail - ref_tail) / jnp.linalg.norm(ref_tail))
    import os
    hi = bool(os.environ.get("MFMG_FUSED_HI")) or jax.default_backend() == "cpu"
    ttol = 1e-5 if hi else 5e-3   # default-precision chain = bf16 passes
    print(f"tail vs XLA-transfer rel err: {err_t:.3e}  (tol {ttol})")
    assert err_t < ttol, err_t

    if not args.time:
        print("OK")
        return

    # in-cycle A/B: full V-cycle with and without the fused tail
    from functools import partial

    nss = 1
    b = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))

    def cycle_unfused(levels, b, x):
        return _cycle(levels, b, x, 0, nss, "v")

    def cycle_fused(levels, fs, b, x):
        lvl = levels[0]
        for _ in range(nss):
            x = lvl.smoother.apply(lvl.op, b, x)
        res = apply_op(lvl.op, x) - b
        x = fused_correction_apply(fs, x, res)
        for _ in range(nss):
            x = lvl.smoother.apply(lvl.op, b, x)
        return x

    @partial(jax.jit, static_argnames=("n", "fused"))
    def cycles(levels, fs, b, x, n, fused):
        def body(i, x):
            return (cycle_fused(levels, fs, b, x) if fused
                    else cycle_unfused(levels, b, x))
        return jax.lax.fori_loop(0, n, body, x)

    def _fresh():
        import os
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(
            size=prob.n_dofs).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def timed(fused, n):
        v = _fresh()
        t0 = time.perf_counter()
        out = cycles(levels, fs, b, v, n, fused)
        cs = float(jnp.vdot(out, out))
        assert np.isfinite(cs)
        return time.perf_counter() - t0

    x0 = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    ya = cycles(levels, fs, b, x0, 3, False)
    yb = cycles(levels, fs, b, x0, 3, True)
    rel = float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya))
    print(f"3-cycle rel diff fused vs not: {rel:.3e}  (bf16-precision noise "
          "of the unfused path)")

    N_LO, N_HI = 20, 200
    for fused in (False, True):
        timed(fused, N_LO); timed(fused, N_HI)
        slopes = []
        for _ in range(6):
            tl, th = timed(fused, N_LO), timed(fused, N_HI)
            if 0 < tl < th:
                slopes.append((th - tl) / (N_HI - N_LO))
            if len(slopes) >= 4:
                break
        ms = float(np.median(slopes)) * 1e3
        print(f"{'fused' if fused else 'plain'}: {ms:.3f} ms/cycle")


if __name__ == "__main__":
    main()
