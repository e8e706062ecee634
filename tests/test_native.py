"""Native host kernels == numpy fallbacks (analog of the reference's
conversion round-trip tests, test_utils_device.cu)."""

import numpy as np
import pytest

from mfmg_tpu import native


def _native_available():
    return native._load() is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native kernels unavailable (no g++)")


def test_assemble_agglomerate_batch_matches_numpy():
    rng = np.random.default_rng(0)
    n_agg, n_bc, n_loc, m, n_cells = 7, 4, 8, 27, 64
    cells_per_agg = rng.integers(0, n_cells, size=(n_agg, n_bc))
    local_cells = rng.integers(0, m, size=(n_bc, n_loc))
    A_loc = rng.normal(size=(n_cells, n_loc, n_loc))
    out = native.assemble_agglomerate_batch_uniform(cells_per_agg, local_cells, A_loc, n_agg, m)
    ref = np.zeros((n_agg, m, m))
    for g in range(n_agg):
        for c in range(n_bc):
            Ac = A_loc[cells_per_agg[g, c]]
            for i in range(n_loc):
                for j in range(n_loc):
                    ref[g, local_cells[c, i], local_cells[c, j]] += Ac[i, j]
    np.testing.assert_allclose(out, ref, atol=1e-14)


def test_ell_pack_matches_scipy():
    import scipy.sparse as sp
    rng = np.random.default_rng(1)
    A = sp.random(50, 50, density=0.1, format="csr", random_state=2)
    L = int(np.diff(A.indptr).max())
    vals, cols = native.ell_pack(A.indptr, A.indices, A.data, 50, L)
    # reconstruct and compare
    B = np.zeros((50, 50))
    for r in range(50):
        for p in range(L):
            B[r, cols[r, p]] += vals[r, p]
    np.testing.assert_allclose(B, A.toarray(), atol=1e-14)


def test_whole_pipeline_with_native(monkeypatch):
    """Hierarchy setup produces identical results with and without native."""
    import importlib
    import os
    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.amge.hierarchy import measure_vcycle_rate
    from mfmg_tpu.config import AgglomerationConfig, SmootherConfig

    prob = LaplaceProblem.hyper_cube(3, 2)
    cfg = Config(is_preconditioner=False, smoother=SmootherConfig(type="jacobi"),
                 agglomeration=AgglomerationConfig(nx=2, ny=2, nz=2))
    r_native = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    # force fallback
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    r_numpy = measure_vcycle_rate(Hierarchy(prob, cfg), 20, seed=0)
    assert r_native == pytest.approx(r_numpy, abs=1e-12)
