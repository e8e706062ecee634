"""Experiment: z-tiled Pallas stencil (129^3+ path), f32 vs bf16 coeffs."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "7"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import LaplaceProblem
    from mfmg_tpu.ops.stencil import stencil_from_csr, StencilOperator
    from mfmg_tpu.ops.pallas_stencil import (
        fits_vmem, pick_tile_bz, pallas_stencil_apply_tiled)
    from mfmg_tpu.ops.stencil import _stencil_apply_xla

    log("device:", jax.devices()[0].device_kind)
    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    op = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float32)
    n = op.shape[0]
    log("grid:", op.grid_shape, "n:", n,
        "fits_vmem:", fits_vmem(op.grid_shape, op.offsets),
        "bz:", pick_tile_bz(op.grid_shape, op.offsets))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    y_ref = np.asarray(_stencil_apply_xla(op, x), dtype=np.float64)
    scale = np.abs(y_ref).max()

    variants = {}
    bz = pick_tile_bz(op.grid_shape, op.offsets)
    if bz:
        variants["tiled_f32"] = (op.coeffs, bz)
        cbf = op.coeffs.astype(jnp.bfloat16)
        bzb = pick_tile_bz(op.grid_shape, op.offsets, coeff_bytes=2)
        variants["tiled_bf16"] = (cbf, bzb)

    fns = {}
    for name, (coeffs, bzv) in variants.items():
        y = np.asarray(pallas_stencil_apply_tiled(
            coeffs, x, op.offsets, op.grid_shape, bzv), dtype=np.float64)
        log(name, "bz=", bzv, "rel err:", np.abs(y - y_ref).max() / scale)
        fns[name] = (coeffs, bzv)

    # timing: repeated applies, norm-renormalized to prevent overflow
    from functools import partial

    def bench(coeffs, bzv, label):
        @partial(jax.jit, static_argnames=("k",))
        def loop(v, k):
            def body(i, v):
                w = pallas_stencil_apply_tiled(coeffs, v, op.offsets,
                                               op.grid_shape, bzv)
                return w * jax.lax.rsqrt(jnp.vdot(w, w).real + 1e-30)
            return jax.lax.fori_loop(0, k, body, v)

        def timed(k):
            v = jnp.asarray(np.random.default_rng(1).uniform(size=n)
                            .astype(np.float32))
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(v, k))
            return time.perf_counter() - t0

        timed(5); timed(50)
        best = 1e9
        for _ in range(3):
            t_lo, t_hi = timed(5), timed(50)
            best = min(best, (t_hi - t_lo) / 45)
        log(f"{label}: {best*1e3:.3f} ms/apply")
        return best

    def bench_xla(o, label):
        @partial(jax.jit, static_argnames=("k",))
        def loop(v, k):
            def body(i, v):
                w = _stencil_apply_xla(o, v)
                return w * jax.lax.rsqrt(jnp.vdot(w, w).real + 1e-30)
            return jax.lax.fori_loop(0, k, body, v)

        def timed(k):
            v = jnp.asarray(np.random.default_rng(1).uniform(size=n)
                            .astype(np.float32))
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(v, k))
            return time.perf_counter() - t0

        timed(5); timed(50)
        best = 1e9
        for _ in range(3):
            t_lo, t_hi = timed(5), timed(50)
            best = min(best, (t_hi - t_lo) / 45)
        log(f"{label}: {best*1e3:.3f} ms/apply")
        return best

    t_xla = bench_xla(op, "xla_f32")
    for name, (coeffs, bzv) in fns.items():
        t = bench(coeffs, bzv, name)
        log(f"  speedup vs xla: {t_xla/t:.2f}x")


if __name__ == "__main__":
    main()
