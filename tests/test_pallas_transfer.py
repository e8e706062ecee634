"""Z-tiled Pallas transfer kernels == the XLA selection-matmul chain
(interpret mode on CPU; adjointness and both directions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                             EigensolverConfig, SmootherConfig)
from mfmg_tpu.ops.pallas_transfer import (build_transfer_tiled,
                                          tiled_prolong, tiled_restrict)
from mfmg_tpu.ops.structured_transfer import (structured_prolong,
                                              structured_restrict)


@pytest.fixture(scope="module")
def transfer():
    prob = LaplaceProblem.hyper_cube(3, 4, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=2,
                 eigensolver=EigensolverConfig(n_eigenvectors=2),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2),
                 coarse=CoarseConfig(type="direct"))
    hier = Hierarchy(prob, cfg)
    tr = hier.levels[0].transfer
    assert tr is not None
    return prob, tr


def test_tiled_restrict_matches_xla(transfer):
    prob, tr = transfer
    ops = build_transfer_tiled(tr)
    assert ops is not None, (tr.grid_shape, tr.agg_shape)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(prob.n_dofs).astype(np.float32))
    ref = structured_restrict(tr, x)
    out = tiled_restrict(ops, x)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 1e-5, err


def test_tiled_prolong_matches_xla(transfer):
    prob, tr = transfer
    ops = build_transfer_tiled(tr)
    rng = np.random.default_rng(1)
    nc = tr.shape[0]
    xc = jnp.asarray(rng.standard_normal(nc).astype(np.float32))
    ref = structured_prolong(tr, xc)
    out = tiled_prolong(ops, xc)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 1e-5, err


def test_tiled_adjointness(transfer):
    """<R x, y> == <x, R^T y> — the pair is an exact adjoint by shared
    operands."""
    prob, tr = transfer
    ops = build_transfer_tiled(tr)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(prob.n_dofs).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(tr.shape[0]).astype(np.float32))
    lhs = float(jnp.vdot(tiled_restrict(ops, x), y))
    rhs = float(jnp.vdot(x, tiled_prolong(ops, y)))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)
