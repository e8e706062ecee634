"""Benchmark harness: V-cycle DoF/s per chip (+ SpMV nnz/s) on real hardware.

Prints ONE JSON line:
  {"metric": "vcycle_dof_per_s", "value": N, "unit": "DoF/s", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against BASELINE_DOF_S — pinned from this framework's first TPU v5e
measurement — so the ratio tracks performance progress across rounds.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# First real-chip measurement (TPU v5e, 3D n_ref=6, Q1, matrix-free chebyshev
# V-cycle, float32).  Updated only when the benchmark config changes.
BASELINE_DOF_S = None  # round 1: establishes the baseline

N_REF = 6
N_CYCLES = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import vcycle
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
    from mfmg_tpu.solve.operator import apply_op

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    prob = LaplaceProblem.hyper_cube(3, N_REF, material_property="linear")
    from mfmg_tpu.config import CoarseConfig
    cfg = Config(operator="ell", dtype="float32",
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="cg", tolerance=1e-6, max_iterations=100))
    hier = Hierarchy(prob, cfg)
    log(f"setup: n_dofs={prob.n_dofs} nnz={prob.A.nnz} "
        f"t={time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(0)
    b = rng.uniform(size=prob.n_dofs).astype(np.float32)
    b[prob.constrained] = 0.0
    b = jnp.asarray(b)
    x = jnp.zeros_like(b)

    nss = cfg.smoother.n_smoothing_steps

    def one_cycle(levels, b, x):
        return vcycle(levels, b, x, n_smoothing_steps=nss, is_preconditioner=False)

    # warmup / compile
    x = one_cycle(hier.levels, b, x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(N_CYCLES):
        x = one_cycle(hier.levels, b, x)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    dof_s = prob.n_dofs * N_CYCLES / dt
    log(f"vcycle: {dt/N_CYCLES*1e3:.3f} ms/cycle -> {dof_s:.3e} DoF/s")

    # SpMV nnz/s on the fine operator
    A = hier.levels[0].op
    y = apply_op(A, b)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(100):
        y = apply_op(A, y / (jnp.linalg.norm(y) + 1.0))
    jax.block_until_ready(y)
    spmv_dt = (time.perf_counter() - t0) / 100
    nnz_s = prob.A.nnz / spmv_dt
    log(f"spmv: {spmv_dt*1e3:.3f} ms -> {nnz_s:.3e} nnz/s")

    vs = 1.0 if BASELINE_DOF_S is None else dof_s / BASELINE_DOF_S
    print(json.dumps({"metric": "vcycle_dof_per_s", "value": dof_s,
                      "unit": "DoF/s", "vs_baseline": vs,
                      "extra": {"spmv_nnz_per_s": nnz_s,
                                "n_dofs": prob.n_dofs,
                                "ms_per_vcycle": dt / N_CYCLES * 1e3}}))


if __name__ == "__main__":
    main()
