"""Adaptive (hanging-node) meshes: the AffineConstraints analog.

The reference inherits hanging-node handling from deal.II AffineConstraints
(tests/laplace.hpp:126-141: make_hanging_node_constraints + condense +
distribute).  These tests cover the minimal TPU-native analog in
fem/adaptive.py: constraint construction, condensation correctness on a
manufactured solution, and the full AMGe hierarchy on a 1-irregular mesh.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.config import AgglomerationConfig, SmootherConfig
from mfmg_tpu.fem.adaptive import adaptive_cube
from mfmg_tpu.fem.mesh import hyper_cube


def _quadrant(centers):
    return np.all(centers < 0.5, axis=1)


def test_constraints_2d_structure():
    mesh = adaptive_cube(2, 2, _quadrant)       # 4x4 grid, lower-left 2x2 refined
    h = mesh.hanging
    assert h is not None
    # 1-irregular interface: the refined quadrant meets unrefined cells along
    # two interface segments of 2 coarse edges each -> 2 interior hanging
    # midpoints per segment minus the boundary-owned ones.  Each hanging dof
    # has exactly 2 masters with weight 1/2.
    assert h.n > 0
    assert np.all(h.n_masters == 2)
    assert np.allclose(h.weights[:, :2], 0.5)
    # every slave sits at the midpoint of its masters (flat mesh)
    mid = 0.5 * (mesh.nodes[h.masters[:, 0]] + mesh.nodes[h.masters[:, 1]])
    assert np.allclose(mesh.nodes[h.slaves], mid)
    # slaves are flagged constrained but are not Dirichlet
    assert np.all(mesh.constrained_mask[h.slaves])
    assert not np.any(mesh.boundary_dofs[h.slaves])


def test_constraints_3d_face_and_edge():
    mesh = adaptive_cube(3, 1, _quadrant)       # 2x2x2, one cell refined
    h = mesh.hanging
    assert h is not None
    # The refined corner cell exposes 3 interior faces to unrefined neighbors:
    # each contributes edge-midpoint constraints (2 masters) and one
    # face-center constraint (4 masters, weight 1/4).
    n4 = int(np.sum(h.n_masters == 4))
    n2 = int(np.sum(h.n_masters == 2))
    assert n4 == 3, (n4, n2)
    assert n2 > 0
    w4 = h.weights[h.n_masters == 4]
    assert np.allclose(w4, 0.25)
    # face centers sit at the mean of their 4 masters
    s4 = h.slaves[h.n_masters == 4]
    m4 = h.masters[h.n_masters == 4]
    assert np.allclose(mesh.nodes[s4], mesh.nodes[m4].mean(axis=1))


def test_condensed_solve_manufactured():
    """-Δu = f with u = sin(pi x) sin(pi y): the condensed system on the
    adaptive mesh must be SPD on free dofs, continuous across the hanging
    interface, and at least as accurate as the unrefined mesh."""

    def exact(p):
        return np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])

    def source(p):
        return 2.0 * np.pi**2 * exact(p)

    errs = {}
    for name, mesh in [("coarse", hyper_cube(2, 4)),
                       ("adaptive", adaptive_cube(2, 4, _quadrant)),
                       ("fine", hyper_cube(2, 5))]:
        prob = LaplaceProblem.from_mesh(mesh, "constant")
        A = prob.A
        assert abs(A - A.T).max() < 1e-12          # condensation keeps symmetry
        rhs = prob.assemble_rhs(source)
        import scipy.sparse.linalg as spla
        u = spla.spsolve(A.tocsc(), rhs)
        u = prob.distribute(u)
        # continuity: slave values equal the coarse-side interpolation
        if mesh.hanging is not None:
            hh = mesh.hanging
            interp = 0.5 * (u[hh.masters[:, 0]] + u[hh.masters[:, 1]])
            assert np.allclose(u[hh.slaves], interp)
        errs[name] = prob.l2_error(u, exact)
    # refinement helps, full refinement helps more
    assert errs["adaptive"] < errs["coarse"]
    assert errs["fine"] < errs["adaptive"]


def test_hierarchy_on_adaptive_mesh():
    """Full AMGe hierarchy on a 1-irregular mesh: slaves ride through setup as
    constrained dofs; PCG converges and the V-cycle contracts."""
    mesh = adaptive_cube(2, 4, _quadrant)
    prob = LaplaceProblem.from_mesh(mesh, "linear")
    cfg = Config(operator="ell", max_levels=2, is_preconditioner=True,
                 smoother=SmootherConfig(type="chebyshev", degree=3),
                 agglomeration=AgglomerationConfig(partitioner="metis",
                                                   n_agglomerates=16))
    hier = Hierarchy(prob, cfg)

    rng = np.random.default_rng(3)
    b = rng.standard_normal(prob.n_dofs)
    b[prob.constrained] = 0.0
    x, info = hier.solve_cg(jnp.asarray(b), tol=1e-8)
    assert int(info["iterations"]) < 40, info
    r = np.asarray(b) - prob.A @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    # hanging slaves stay untouched by the preconditioned solve (identity rows)
    assert np.allclose(np.asarray(x)[mesh.hanging.slaves], 0.0)


def test_matrix_free_raises_on_hanging():
    mesh = adaptive_cube(2, 2, _quadrant)
    prob = LaplaceProblem.from_mesh(mesh, "constant")
    with pytest.raises(NotImplementedError):
        prob.matrix_free_operator()
