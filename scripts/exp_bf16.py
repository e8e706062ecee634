"""Experiment: bf16-stored stencil coefficients (f32 compute) vs f32."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REF = int(os.environ.get("MFMG_BENCH_NREF", "6"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from mfmg_tpu import LaplaceProblem
    from mfmg_tpu.ops.stencil import stencil_from_csr, StencilOperator

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    op = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float32)
    op_bf = StencilOperator(coeffs=op.coeffs.astype(jnp.bfloat16),
                            offsets=op.offsets, grid_shape=op.grid_shape)
    n = op.shape[0]

    def apply_bf(o, x):
        k = max(max(abs(v) for v in off) for off in o.offsets)
        xg = x.reshape(o.grid_shape)
        xp = jnp.pad(xg, k)
        y = None
        for i, off in enumerate(o.offsets):
            sl = tuple(slice(k + v, k + v + m) for v, m in zip(off, o.grid_shape))
            t = o.coeffs[i].astype(jnp.float32) * xp[sl]
            y = t if y is None else y + t
        return y.reshape(x.shape)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    y32 = np.asarray(op @ x)
    ybf = np.asarray(apply_bf(op_bf, x))
    rel = np.abs(y32 - ybf).max() / np.abs(y32).max()
    log("bf16 rel err:", rel)

    def fresh():
        seed = int.from_bytes(os.urandom(4), "little")
        v = jnp.asarray(np.random.default_rng(seed).uniform(size=n).astype(np.float32))
        jax.block_until_ready(v)
        return v

    def two_point(fn, label):
        @partial(jax.jit, static_argnames=("k",))
        def loop(x, k):
            def body(i, v):
                v = fn(v)
                return v * jax.lax.rsqrt(jnp.vdot(v, v).real + 1e-30)
            return jax.lax.fori_loop(0, k, body, x)

        def timed(k):
            v = fresh()
            t0 = time.perf_counter()
            out = loop(v, k)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        timed(5), timed(50)
        for _ in range(5):
            t_lo, t_hi = timed(5), timed(50)
            if 0 < t_lo < t_hi:
                dt = (t_hi - t_lo) / 45
                log(f"{label:<24} {dt*1e3:8.4f} ms  ({prob.A.nnz/dt:.3e} nnz/s)")
                return dt
        log(label, "TIMING FAILED")

    two_point(lambda v: op @ v, "f32 coeffs")
    two_point(lambda v: apply_bf(op_bf, v), "bf16 coeffs, f32 compute")


if __name__ == "__main__":
    main()
