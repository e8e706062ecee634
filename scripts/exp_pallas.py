"""Experiment: Pallas resident-x stencil kernel vs the XLA slice apply."""

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
    from mfmg_tpu.ops.stencil import stencil_from_csr
    from mfmg_tpu.ops.pallas_stencil import pallas_stencil_apply, fits_vmem

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    op = stencil_from_csr(prob.A, prob.mesh, dtype=jnp.float32)
    n = op.shape[0]
    log("fits_vmem:", fits_vmem(op.grid_shape, op.offsets))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    y_xla = np.asarray(op @ x)
    y_pl = np.asarray(pallas_stencil_apply(op.coeffs, x, op.offsets, op.grid_shape))
    log("pallas rel err:", np.abs(y_xla - y_pl).max() / np.abs(y_xla).max())

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
                gbs = (op.coeffs.size + 2 * n) * 4 / dt / 1e9
                log(f"{label:<18} {dt*1e3:8.4f} ms  ({prob.A.nnz/dt:.3e} nnz/s, "
                    f"{gbs:.0f} GB/s)")
                return dt
        log(label, "TIMING FAILED")

    two_point(lambda v: op @ v, "xla slices")
    two_point(lambda v: pallas_stencil_apply(op.coeffs, v, op.offsets,
                                             op.grid_shape), "pallas resident-x")


if __name__ == "__main__":
    main()
