"""Worker for the multi-process jax.distributed test (not a pytest module).

Usage: python _multiproc_worker.py <process_id> <num_processes> <port> <local_devices>

Each process contributes `local_devices` virtual CPU devices to the global
mesh — the analog of one MPI rank in the reference's 1/2/4-rank test registry
(tests/CMakeLists.txt:8-57).  Every process builds the identical problem,
runs the slab-sharded V-cycle over the GLOBAL device mesh, and checks its own
addressable output shards against the locally computed single-device result.
Prints MULTIPROC-OK on success.
"""

import os
import sys


def main():
    pid, nproc, port, local = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], int(sys.argv[4]))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_devices = len(jax.devices())
    assert n_devices == nproc * local

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import vcycle as ref_vcycle
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
    from mfmg_tpu.parallel.spmd import build_spmd_vcycle

    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", dtype="float64", is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    hier = Hierarchy(prob, cfg)

    rng = np.random.default_rng(0)
    b = rng.uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x0 = rng.uniform(size=prob.n_dofs)
    x0[prob.constrained] = 0.0

    # single-device reference, computed identically on every process (pinned
    # to one local device — a bare jit here would produce global arrays)
    with jax.default_device(jax.local_devices()[0]):
        ref = np.asarray(ref_vcycle(hier.levels, jnp.asarray(b), jnp.asarray(x0),
                                    n_smoothing_steps=1, is_preconditioner=False))

    sv = build_spmd_vcycle(hier, devices=np.array(jax.devices()))
    out = sv.fn(sv.to_grid(b), sv.to_grid(x0))
    jax.block_until_ready(out)

    ref_grid = np.zeros(sv.grid_shape)
    ref_grid[: sv.orig_grid[0]] = ref.reshape(sv.orig_grid)
    tol = 1e-13 * max(1.0, np.abs(ref).max())
    for shard in out.addressable_shards:
        expect = ref_grid[shard.index]
        got = np.asarray(shard.data)
        err = np.abs(got - expect).max()
        assert err <= tol, (pid, shard.index, err)

    # ---- 2-axis pencil decomposition across processes --------------------
    if n_devices >= 4 and n_devices % 2 == 0:
        sv2 = build_spmd_vcycle(hier, devices=np.array(jax.devices()),
                                mesh_shape=(n_devices // 2, 2))
        out2 = sv2.fn(sv2.to_grid(b), sv2.to_grid(x0))
        jax.block_until_ready(out2)
        ref2 = np.zeros(sv2.grid_shape)
        ref2[tuple(slice(0, o) for o in sv2.orig_grid)] = ref.reshape(sv2.orig_grid)
        for shard in out2.addressable_shards:
            err = np.abs(np.asarray(shard.data) - ref2[shard.index]).max()
            assert err <= tol, ("pencil", pid, shard.index, err)

    # ---- distributed setup: each process builds only its agglomerate slab
    # (the analog of the reference's MPI-decomposed setup,
    # amge.templates.hpp:596-643) and the result matches the replicated
    # setup bitwise-close.
    import dataclasses

    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate

    # 3 levels so the DEEP (level-1 recursive) restrictor runs distributed
    # too (the reference's setup is MPI-decomposed at every level,
    # amge.templates.hpp:596-643)
    from mfmg_tpu.config import EigensolverConfig
    cfg3 = dataclasses.replace(
        cfg, max_levels=3,
        eigensolver=EigensolverConfig(n_eigenvectors=2, n_eigenvectors_deep=2))
    hier3 = Hierarchy(prob, cfg3)
    cfg_d = dataclasses.replace(cfg3, distributed_setup=True)
    hier_d = Hierarchy(prob, cfg_d)
    assert hier_d._distributed()
    # the slab really was a slab (not the whole batch), super-aligned
    batch_slab, agg_sels = hier_d._dist_slab
    n_agg = hier_d._level0_eigendata[0].n_agg
    assert batch_slab.n_agg < n_agg or nproc == 1, (batch_slab.n_agg, n_agg)
    assert len(agg_sels) == nproc
    assert hier_d._level0_eigendata[0].A_agg is None      # light full batch
    # restriction and coarse operators at EVERY level match the replicated
    # setup bitwise-close
    R_r = hier3._R_composed
    R_d = hier_d._R_composed
    assert R_r.shape == R_d.shape, (R_r.shape, R_d.shape)
    assert abs(R_r - R_d).max() < 1e-11
    for lvl in (1, 2):
        dA = abs(hier3._A_per_level[lvl] - hier_d._A_per_level[lvl]).max()
        assert dA < 1e-10, (lvl, dA)
    # the V-cycle rate agrees
    # (the distributed Galerkin COO reduce sums in a different order, so the
    # coarse operator differs at float64 roundoff — rates agree to ~1e-9)
    r_ref = measure_vcycle_rate(hier3, n_cycles=10, seed=0)
    r_dist = measure_vcycle_rate(hier_d, n_cycles=10, seed=0)
    assert abs(r_ref - r_dist) < 1e-8, (r_ref, r_dist)

    print(f"MULTIPROC-OK pid={pid}/{nproc} devices={n_devices}", flush=True)


if __name__ == "__main__":
    main()
