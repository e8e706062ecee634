"""Weak/strong-scaling harness for the SPMD V-cycle (BASELINE config #5).

Runs the shard_map stencil V-cycle at increasing device counts.  On real
multi-chip hardware this sweeps actual TPU devices over ICI; in this
environment only ONE physical chip is attached, so by default the sweep runs
on a virtual CPU device mesh — which validates the sharded program and the
collective pattern, not ICI throughput.

    python bench_scaling.py [--devices 1 2 4 8] [--n-ref 4] [--weak]

--weak grows the problem with the device count (fixed local slab size);
otherwise the sweep is strong scaling on a fixed problem.  Prints one JSON
line per device count with per-cycle time measured by the two-point method.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(sv, n_dofs, n_lo=3, n_hi=20):
    import jax
    import jax.numpy as jnp
    import os

    def timed(n):
        seed = int.from_bytes(os.urandom(4), "little")
        b = sv.to_grid(np.random.default_rng(seed).uniform(size=n_dofs).astype(np.float32))
        x = sv.to_grid(np.zeros(n_dofs, np.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            x = sv.fn(b, x)
        cs = float(jnp.vdot(x, x))
        assert np.isfinite(cs)
        return time.perf_counter() - t0

    timed(n_lo), timed(n_hi)          # warmup compiles
    for _ in range(5):
        t_lo, t_hi = timed(n_lo), timed(n_hi)
        if 0 < t_lo < t_hi:
            return (t_hi - t_lo) / (n_hi - n_lo)
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--n-ref", type=int, default=4)
    p.add_argument("--weak", action="store_true")
    p.add_argument("--mesh-2d", action="store_true",
                   help="2-D (z,y) pencil decomposition: P -> (P//2, 2) mesh")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (default when <2 accelerators)")
    args = p.parse_args(argv)

    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    n_avail = len(jax.devices())
    if n_avail < 2:
        jax.config.update("jax_platforms", "cpu")
        n_avail = len(jax.devices())
        log(f"single accelerator attached; falling back to {n_avail} virtual CPU "
            "devices (validates sharding, not ICI throughput)")

    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import AgglomerationConfig, CoarseConfig, SmootherConfig
    from mfmg_tpu.parallel.spmd import build_spmd_vcycle

    devices = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]
    results = []
    base_ref = args.n_ref
    for P in devices:
        n_ref = base_ref + (int(np.log2(P)) if args.weak else 0) // 3
        prob = LaplaceProblem.hyper_cube(3, n_ref, material_property="linear")
        cfg = Config(operator="stencil", dtype="float32",
                     smoother=SmootherConfig(type="chebyshev", degree=2),
                     agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2),
                     coarse=CoarseConfig(type="direct"))
        hier = Hierarchy(prob, cfg)
        mesh_shape = ((P // 2, 2) if args.mesh_2d and P >= 4 else None)
        sv = build_spmd_vcycle(hier, n_devices=P, mesh_shape=mesh_shape)
        dt = measure(sv, prob.n_dofs)
        rec = {"devices": P, "n_dofs": prob.n_dofs,
               "ms_per_vcycle": None if dt is None else dt * 1e3,
               "dof_per_s": None if dt is None else prob.n_dofs / dt}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if len(results) >= 2 and results[0]["ms_per_vcycle"] and results[-1]["ms_per_vcycle"]:
        eff = (results[0]["ms_per_vcycle"] / results[-1]["ms_per_vcycle"]) / \
              (results[-1]["devices"] / results[0]["devices"])
        log(f"strong-scaling efficiency {results[0]['devices']}->{results[-1]['devices']}: {eff:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
