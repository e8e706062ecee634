"""hierarchy_driver: the CLI benchmark app.

Analog of the reference's tests/hierarchy_driver.cc: reads an mfmg-style
.info config, builds the Laplace problem + hierarchy, and either runs
hierarchy-preconditioned CG (printing the iteration count,
hierarchy_driver.cc:104-116) or 20 standalone V-cycles (printing the
asymptotic convergence rate, hierarchy_driver.cc:75-102).

    python -m mfmg_tpu.driver -f input.info -d 3 [--solve] [-t 1e-6]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--file", help="mfmg-style .info (or .json) config file")
    p.add_argument("-d", "--dim", type=int, default=2)
    p.add_argument("-m", "--matrix-free", action="store_true",
                   help="use the matrix-free operator path")
    p.add_argument("--operator", default=None,
                   help="operator representation: ell | stencil | matrix_free | sumfac")
    p.add_argument("-t", "--tolerance", type=float, default=None,
                   help="CG solver tolerance (default: .info "
                        "solver.tolerance, else 1e-6)")
    p.add_argument("--solve", action="store_true",
                   help="CG-preconditioner mode (default: 20 V-cycles + rate)")
    p.add_argument("--n-refinements", type=int, default=None)
    p.add_argument("--dtype", default=None)
    p.add_argument("--max-levels", type=int, default=None)
    p.add_argument("--fe-degree", type=int, default=None,
                   help="Q_k element degree (laplace.fe_degree in .info)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the apply phase "
                        "(the reference's TimerOutput analog at kernel level)")
    p.add_argument("--spmd", type=int, metavar="N", default=None,
                   help="run the apply phase slab-sharded over N devices "
                        "(the analog of the reference's 'mpirun -n N "
                        "hierarchy_driver'; requires the stencil operator)")
    p.add_argument("--save-hierarchy", metavar="PATH", default=None,
                   help="persist the built hierarchy (npz) for later reuse")
    p.add_argument("--load-hierarchy", metavar="PATH", default=None,
                   help="skip setup; reload a hierarchy saved earlier")
    p.add_argument("--raw-ml", action="store_true",
                   help="uncover the .info 'hidden' ML subtree (the "
                        "reference driver's use_raw_ml switch): a single "
                        "mfmg level with the smoothed-aggregation ML coarse "
                        "solver")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.utils.timer import TimerOutput

    cfg_dict = {}
    if args.file:
        if args.file.endswith(".json"):
            import json
            with open(args.file) as f:
                cfg_dict = json.load(f)
        else:
            from mfmg_tpu.utils.info_parser import load_info
            cfg_dict = load_info(args.file)
    is_info = bool(args.file) and not args.file.endswith(".json")
    if cfg_dict and is_info:
        # the reference driver's forced settings (hierarchy_driver.cc:255-272)
        # apply to reference-style .info runs ONLY: fast AP, LOBPCG at 1e-3,
        # and the use_raw_ml 'uncover' of the hidden ML parameter subtree.
        # Native JSON configs keep their explicit eigensolver choice
        # (lapack/arpack/lanczos stay reachable through the CLI).
        use_raw_ml = (args.raw_ml or str(cfg_dict.get("use_raw_ml", "false"))
                      .strip().lower() in ("true", "1", "yes"))
        if (not args.matrix_free and use_raw_ml
                and isinstance(cfg_dict.get("hidden"), dict)):
            for k, v in cfg_dict["hidden"].items():
                cfg_dict[k] = v
        cfg_dict["fast_ap"] = True
        cfg_dict.setdefault("eigensolver", {})
        cfg_dict["eigensolver"]["type"] = "anasazi"
        cfg_dict["eigensolver"]["tolerance"] = 1e-3
    cfg = Config.from_dict(cfg_dict, info_style=is_info)
    if args.matrix_free:
        cfg.operator = "matrix_free"
        if cfg.smoother.type == "jacobi":
            cfg.smoother.type = "chebyshev"
    if args.operator:
        cfg.operator = args.operator
    if args.dtype:
        cfg.dtype = args.dtype
    if args.max_levels:
        cfg.max_levels = args.max_levels

    laplace = cfg_dict.get("laplace", {})
    n_ref = args.n_refinements or int(laplace.get("n_refinements", 3))
    material = cfg_dict.get("material_property", {}).get("type", "constant")
    mesh_kind = laplace.get("mesh", "hyper_cube")
    distort = str(laplace.get("distort_random", "false")).lower() == "true"
    fe_degree = args.fe_degree or int(laplace.get("fe_degree", 1))

    reordering = str(laplace.get("reordering", "None"))

    timer = TimerOutput()
    with timer.section("Setup: problem"):
        if mesh_kind == "hyper_ball":
            from mfmg_tpu.fem.mesh import hyper_ball
            mesh = hyper_ball(args.dim, n_ref, degree=fe_degree,
                              distort_random=distort)
        else:
            from mfmg_tpu.fem.mesh import hyper_cube
            mesh = hyper_cube(args.dim, n_ref, degree=fe_degree,
                              distort_random=distort)
        # DoF renumbering (laplace.hpp:115-122): RCM supported; the boost
        # orderings have no scipy analog — warn LOUDLY rather than silently
        # ignoring (the reference's goldens are reordering-invariant,
        # test_hierarchy.cc:282-307)
        rlow = reordering.strip().lower().replace("-", "_").replace(" ", "_")
        if rlow not in ("none", ""):
            from mfmg_tpu.fem.mesh import renumber_dofs
            try:
                mesh = renumber_dofs(mesh, reordering)
                if cfg.operator in ("stencil", "matrix_free", "sumfac"):
                    import warnings
                    warnings.warn(
                        f"laplace.reordering={reordering!r}: renumbered dofs "
                        "are not lexicographic; switching operator to 'ell'")
                    cfg.operator = "ell"
            except ValueError:
                import warnings
                warnings.warn(
                    f"laplace.reordering={reordering!r} is not supported "
                    "(only Reverse Cuthill_McKee and King); proceeding with "
                    "the natural numbering — the reference's golden rates "
                    "are reordering-invariant (test_hierarchy.cc:282-307)")
        prob = LaplaceProblem.from_mesh(mesh, material)
    with timer.section("Setup: hierarchy"):
        if args.load_hierarchy:
            hier = Hierarchy.load(args.load_hierarchy, prob)
        else:
            hier = Hierarchy(prob, cfg)
    if args.save_hierarchy:
        hier.save(args.save_hierarchy)

    print(f"n_dofs: {prob.n_dofs}  levels: {len(hier.levels)}  "
          f"grid complexity: {hier.grid_complexity():.3f}  "
          f"operator complexity: {hier.operator_complexity():.3f}")

    import contextlib
    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax
        profile_ctx = jax.profiler.trace(args.profile)

    rng = np.random.default_rng(0)
    if args.spmd:
        from mfmg_tpu.parallel.spmd import build_spmd_vcycle
        from mfmg_tpu.solve.operator import apply_op
        sv = build_spmd_vcycle(hier, n_devices=args.spmd)
        x = rng.uniform(size=prob.n_dofs)
        x[prob.constrained] = 0.0
        xg = sv.to_grid(x.astype(hier.dtype))
        bg = sv.to_grid(np.zeros(prob.n_dofs, dtype=hier.dtype))
        rate = None
        res_prev = None
        with profile_ctx, timer.section(f"Apply: 20 V-cycles (spmd n={args.spmd})"):
            for _ in range(20):
                xg = sv.fn(bg, xg)
                xf = jnp.asarray(sv.from_grid(xg))
                res = float(jnp.linalg.norm(apply_op(hier.levels[0].op, xf)))
                if res_prev:
                    rate = res / res_prev
                nrm = float(np.linalg.norm(np.asarray(xg)))
                xg, res_prev = xg / nrm, res / nrm
        print(f"Convergence rate: {rate:.10f}")
        print(timer.summary())
        return 0
    # CLI -t wins; else the .info solver.tolerance; else 1e-6 — the
    # reference driver's precedence (hierarchy_driver.cc:273-279)
    solver_tol = args.tolerance
    if solver_tol is None:
        solver_tol = float(cfg_dict.get("solver", {}).get("tolerance", 1e-6))
    with profile_ctx:
        if args.solve:
            b = rng.uniform(size=prob.n_dofs)
            b[prob.constrained] = 0.0
            with timer.section("Apply: CG solve"):
                x, info = hier.solve_cg(jnp.asarray(b, dtype=hier.dtype),
                                        tol=solver_tol)
            print(f"Solved in {int(info['iterations'])} iterations, "
                  f"relative residual {float(info['relres']):.3e}")
        else:
            with timer.section("Apply: 20 V-cycles"):
                rate = measure_vcycle_rate(hier, n_cycles=20, seed=0)
            print(f"Convergence rate: {rate:.10f}")

    print(timer.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
