"""Fused coarse-tail Pallas kernel vs the generic recursion.

Runs in Pallas interpreter mode on the CPU backend (conftest forces cpu), so
every roll/matmul of the kernel is checked bit-tightly against the plain XLA
path — on CPU both compute in exact f32 (no TPU bf16 default-precision
passes), so tolerances are roundoff-level.

Reference analog: the recursion being fused is Hierarchy::apply at levels
>= 1 (/root/reference/include/mfmg/common/hierarchy.hpp:246-309).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mfmg_tpu import Config, Hierarchy, LaplaceProblem
from mfmg_tpu.amge.hierarchy import _cycle, vcycle
from mfmg_tpu.config import (AgglomerationConfig, CoarseConfig,
                             EigensolverConfig, SmootherConfig)
from mfmg_tpu.ops.fused_cycle import (build_fused_tail,
                                      fused_correction_apply,
                                      fused_subcycle_apply)
from mfmg_tpu.solve.operator import apply_op


@pytest.fixture(scope="module")
def hier3():
    prob = LaplaceProblem.hyper_cube(3, 4, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 eigensolver=EigensolverConfig(n_eigenvectors=2,
                                               n_eigenvectors_deep=4),
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    return prob, Hierarchy(prob, cfg)


def test_subcycle_matches_recursion(hier3):
    prob, hier = hier3
    levels = tuple(hier.levels)
    fs = build_fused_tail(levels, 1)
    assert fs is not None and fs.fine_grid is not None
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.standard_normal(levels[1].op.shape[0])
                     .astype(np.float32))
    x_ref = _cycle(levels, b1, jnp.zeros_like(b1), 1, 1, "v")
    x_sub = fused_subcycle_apply(fs, b1)
    err = float(jnp.linalg.norm(x_sub - x_ref) / jnp.linalg.norm(x_ref))
    assert err < 1e-5


def test_full_tail_matches_transfer_chain(hier3):
    prob, hier = hier3
    levels = tuple(hier.levels)
    fs = build_fused_tail(levels, 1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    res = jnp.asarray(rng.standard_normal(prob.n_dofs).astype(np.float32))
    bc = levels[0].transfer.restrict(res)
    xc = _cycle(levels, bc, jnp.zeros_like(bc), 1, 1, "v")
    ref = x - levels[0].transfer.prolong(xc)
    out = fused_correction_apply(fs, x, res)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 1e-5


def test_windowed_subcycle_matches_dense(hier3):
    """The windowed L1<->L2 form (Rd stripped, as on 129^3-fine hierarchies
    whose dense Rd exceeds VMEM) must reproduce the dense-Rd sub-cycle to
    f32 roundoff — same math, selection-matmul route."""
    import dataclasses

    prob, hier = hier3
    levels = tuple(hier.levels)
    fs_dense = build_fused_tail(levels, 1)
    assert fs_dense is not None and fs_dense.Rdp is not None
    tr_win = dataclasses.replace(levels[1].transfer, Rd=None)
    levels_win = (levels[0], dataclasses.replace(levels[1], transfer=tr_win),
                  levels[2])
    fs_win = build_fused_tail(levels_win, 1)
    assert fs_win is not None and fs_win.Rdp is None
    assert fs_win.Wt2 is not None
    rng = np.random.default_rng(3)
    b1 = jnp.asarray(rng.standard_normal(levels[1].op.shape[0])
                     .astype(np.float32))
    x_dense = fused_subcycle_apply(fs_dense, b1)
    x_win = fused_subcycle_apply(fs_win, b1)
    err = float(jnp.linalg.norm(x_win - x_dense) / jnp.linalg.norm(x_dense))
    assert err < 1e-5
    # and against the generic recursion through the windowed transfer
    x_ref = _cycle(levels_win, b1, jnp.zeros_like(b1), 1, 1, "v")
    err2 = float(jnp.linalg.norm(x_win - x_ref) / jnp.linalg.norm(x_ref))
    assert err2 < 1e-5


def test_fused_vcycle_dispatch(hier3, monkeypatch):
    """MFMG_FORCE_FUSED wires the kernel into the jitted V-cycle; the full
    cycle must match the unfused one to f32 roundoff."""
    prob, hier = hier3
    monkeypatch.setenv("MFMG_FORCE_FUSED", "1")
    hier._maybe_fuse_tail()
    assert hier.levels[0].fused is not None
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    x0 = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    y_fused = vcycle(hier.levels, b, x0, n_smoothing_steps=1,
                     is_preconditioner=False)
    import dataclasses
    levels_plain = [dataclasses.replace(hier.levels[0], fused=None)] + \
        list(hier.levels[1:])
    y_plain = vcycle(levels_plain, b, x0, n_smoothing_steps=1,
                     is_preconditioner=False)
    err = float(jnp.linalg.norm(y_fused - y_plain) / jnp.linalg.norm(y_plain))
    assert err < 1e-5
    # nss mismatch must fall back to the generic recursion (and stay correct)
    y2 = vcycle(hier.levels, b, x0, n_smoothing_steps=2,
                is_preconditioner=False)
    y2_ref = vcycle(levels_plain, b, x0, n_smoothing_steps=2,
                    is_preconditioner=False)
    assert float(jnp.linalg.norm(y2 - y2_ref)) < 1e-4 * float(
        jnp.linalg.norm(y2_ref))


def test_reduced_storage_tail_close(hier3):
    """bf16 tail-operand storage (coeff_dtype=bf16 hierarchies) stays within
    bf16 accuracy of the f32-stored fused tail — the matmul chain already
    runs DEFAULT-precision bf16 passes, so only elementwise upconverts and
    the dense-Rd broadcast change."""
    prob, hier = hier3
    levels = tuple(hier.levels)
    fs32 = build_fused_tail(levels, 1)
    fsr = build_fused_tail(levels, 1, reduced_storage=True)
    assert fsr.Wt.dtype == jnp.bfloat16 and fsr.Kp.dtype == jnp.bfloat16
    rng = np.random.default_rng(5)
    b1 = jnp.asarray(rng.standard_normal(levels[1].op.shape[0])
                     .astype(np.float32))
    x32 = fused_subcycle_apply(fs32, b1)
    xr = fused_subcycle_apply(fsr, b1)
    err = float(jnp.linalg.norm(xr - x32) / jnp.linalg.norm(x32))
    assert err < 3e-2, err
    # full tail too
    x = jnp.asarray(rng.uniform(size=prob.n_dofs).astype(np.float32))
    res = jnp.asarray(rng.standard_normal(prob.n_dofs).astype(np.float32))
    o32 = fused_correction_apply(fs32, x, res)
    orr = fused_correction_apply(fsr, x, res)
    err2 = float(jnp.linalg.norm(orr - o32) / jnp.linalg.norm(o32))
    assert err2 < 3e-2, err2
