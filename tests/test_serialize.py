"""Hierarchy persistence: save/load round-trips bit-exactly (utils/serialize).

The reference rebuilds hierarchies every run; persistence is an extension
enabled by the hierarchy being a pytree of arrays.
"""

import numpy as np
import jax.numpy as jnp

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.config import AgglomerationConfig, SmootherConfig


def test_save_load_roundtrip(tmp_path):
    prob = LaplaceProblem.hyper_cube(3, 3, material_property="linear")
    cfg = Config(operator="stencil", max_levels=3,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    h = Hierarchy(prob, cfg)
    p = str(tmp_path / "h.npz")
    h.save(p)
    h2 = Hierarchy.load(p, prob)

    b = np.random.default_rng(0).uniform(size=prob.n_dofs)
    b[prob.constrained] = 0.0
    x1, i1 = h.solve_cg(b, tol=1e-10)
    x2, i2 = h2.solve_cg(b, tol=1e-10)
    assert int(i1["iterations"]) == int(i2["iterations"])
    assert float(jnp.abs(x1 - x2).max()) == 0.0
    assert h2.grid_complexity() == h.grid_complexity()
    assert h2.operator_complexity() == h.operator_complexity()
