"""Batched dense symmetric eigensolver for agglomerate coarse spaces.

TPU-native analog of the reference "lapack" eigensolver path
(dealii/amge_host.templates.hpp:446-467) and the cuSOLVER sygvd path
(cuda/amge_device.templates.cuh:86-172): instead of one dense eigensolve per
agglomerate in a thread/stream loop, the whole padded batch is solved at once.

Reference semantics reproduced exactly (amge_host.templates.hpp:384-394):
  * the diagonal is shifted by the mean diagonal to move eigenvalues away
    from zero (the shift changes eigenvalues, never eigenvectors),
  * constrained (Dirichlet) dofs get their diagonal pinned to 200 so their
    decoupled eigenvectors sort far above the physical smallest modes,
  * the n_ev smallest eigenpairs are kept; eigenvalues are un-shifted.

Padding dofs get a diagonal ~100x above the largest physical entry so their
(exactly decoupled) unit eigenvectors sort above everything real while keeping
the dynamic range small enough for float32 device eigensolves.
"""

from __future__ import annotations

import os

import numpy as np

from mfmg_tpu.amge.local_problems import AgglomerateBatch

CONSTRAINED_DIAG = 200.0  # amge_host.templates.hpp:393


def batched_smallest_eigenpairs(batch: AgglomerateBatch, n_ev: int,
                                constrained_mode: str = "pin",
                                use_device: bool = False,
                                host_dtype=np.float64):
    """Returns (eigenvalues (n_agg, n_ev), eigenvectors (n_agg, m_max, n_ev)).

    Eigenvectors are L2-normalized (eigh returns orthonormal columns), zero on
    padding; components at constrained dofs are exactly zero (decoupled).

    constrained_mode selects the reference path being reproduced:
      * "pin": host matrix path — shift diagonal by its mean, pin constrained
        dofs to 200 (amge_host.templates.hpp:384-394).  Constrained modes can
        never enter the coarse space.
      * "identity": matrix-free path — no diagonal shift (deal.II MatrixFree
        convention; what the reference's MF Lanczos operates on).  Constrained
        dofs are still pinned to 200: the reference leaves them at exactly 1,
        which silently admits useless constrained unit vectors into the coarse
        space whenever an agglomerate's physical spectrum crosses 1 (and makes
        its own fast-AP identity inconsistent); pinning excludes them while
        reproducing the reference's golden configurations, whose physical
        eigenvalues all sit below 1.
      * "raw": device path — no shift, constrained diagonal keeps its
        assembled value (amge_device.templates.cuh:232-285).  WARNING: for
        boundary agglomerates the constrained eigenvalues form a degenerate
        cluster inside the physical spectrum; the selected basis is then
        LAPACK-dependent, as it is cusolver-dependent in the reference.

    use_device=True runs jnp.linalg.eigh (batched on the accelerator) — useful
    when agglomerates are large; default is host LAPACK in float64.
    """
    n_agg, m_max = batch.dof_map.shape
    if np.any(batch.sizes < n_ev):
        raise ValueError("an agglomerate has fewer dofs than requested eigenvectors")

    if constrained_mode == "pin":
        shifts = (batch.diag * batch.valid).sum(axis=1) / batch.sizes
    elif constrained_mode in ("identity", "raw"):
        shifts = np.zeros(n_agg)
    else:
        raise ValueError(f"unknown constrained_mode {constrained_mode!r}")

    if not use_device and n_ev <= 8:
        # Only n_ev smallest pairs are needed: LAPACK's subset driver on the
        # unpadded submatrices is ~6x faster than the full batched eigh
        # (measured 1.7 s vs 27 s for (4096, 125, 125) f32), and padding
        # never enters the solve at all.  Diagonal edits go through a
        # writable einsum view — one dtype-cast pass over the batch total.
        import scipy.linalg as sla
        from scipy.linalg import lapack as _lap
        # Raw LAPACK subset driver: ~3x less per-call overhead than the
        # scipy.linalg.eigh wrapper (0.37 vs 1.05 ms at 125x125 f32), which
        # matters at tens of thousands of agglomerates per level.
        syevx = (_lap.ssyevx if np.dtype(host_dtype) == np.float32
                 else _lap.dsyevx)
        syevx_lwork = (_lap.ssyevx_lwork if np.dtype(host_dtype) == np.float32
                       else _lap.dsyevx_lwork)
        # Blocked-optimal workspace per matrix size (f2py defaults to the
        # LAPACK minimum 8n, which serializes the reduction for larger
        # blocks).  Plain dict: GIL-atomic, worst case a duplicate query.
        _lwork_cache: dict = {}

        def _lwork(sz):
            lw = _lwork_cache.get(sz)
            if lw is None:
                wk, info = syevx_lwork(sz, lower=1)
                lw = int(wk) if info == 0 else 8 * sz
                _lwork_cache[sz] = lw
            return lw

        Mh = batch.A_agg               # read-only; per-solve copies below
        pin = constrained_mode in ("pin", "identity")
        evals = np.zeros((n_agg, n_ev))
        evecs = np.zeros((n_agg, m_max, n_ev))

        def _solve_range(lo, hi):
            # LAPACK releases the GIL, so threads scale on the host cores.
            # Each solve copies only its own (sz, sz) block (diagonal edits
            # happen on the copy) — the batch itself is never duplicated.
            for i in range(lo, hi):
                sz = int(batch.sizes[i])
                Mi = np.array(Mh[i, :sz, :sz], dtype=host_dtype)
                dv = np.einsum("ii->i", Mi)
                dv += host_dtype(shifts[i])
                if pin:
                    dv[batch.constrained[i, :sz]] = CONSTRAINED_DIAG
                w, v, m_found, ifail, info = syevx(
                    Mi, range="I", il=1, iu=n_ev, lower=1, overwrite_a=1,
                    lwork=_lwork(sz))
                if info != 0 or m_found < n_ev:
                    # rare: rebuild the (overwritten) block and use the
                    # robust scipy driver
                    Mi = np.array(Mh[i, :sz, :sz], dtype=host_dtype)
                    dv = np.einsum("ii->i", Mi)
                    dv += host_dtype(shifts[i])
                    if pin:
                        dv[batch.constrained[i, :sz]] = CONSTRAINED_DIAG
                    w, v = sla.eigh(Mi, subset_by_index=[0, n_ev - 1],
                                    driver="evr", check_finite=False)
                evals[i] = w[:n_ev].astype(np.float64) - shifts[i]
                evecs[i, :sz] = v[:, :n_ev].astype(np.float64)

        n_workers = min(os.cpu_count() or 1, 8)
        if n_workers > 1 and n_agg >= 4 * n_workers:
            from concurrent.futures import ThreadPoolExecutor

            from mfmg_tpu.utils.threads import blas_single_thread
            bounds = np.linspace(0, n_agg, n_workers + 1).astype(int)
            with blas_single_thread():
                with ThreadPoolExecutor(n_workers) as pool:
                    futs = [pool.submit(_solve_range, bounds[k], bounds[k + 1])
                            for k in range(n_workers)]
                    for f in futs:
                        f.result()
        else:
            _solve_range(0, n_agg)
        evecs = evecs * batch.valid[:, :, None]
        return evals, evecs

    M = batch.A_agg.copy()
    ar = np.arange(m_max)
    M[:, ar, ar] += shifts[:, None] * batch.valid
    # Pin constrained dofs, padding higher than everything.
    di = M[:, ar, ar]
    if constrained_mode in ("pin", "identity"):
        di = np.where(batch.constrained, CONSTRAINED_DIAG, di)
    pad_value = 100.0 * max(np.abs(M).max(), CONSTRAINED_DIAG)
    di = np.where(~batch.valid, pad_value, di)
    M[:, ar, ar] = di

    if use_device:
        import jax
        import jax.numpy as jnp
        dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        w_j, v_j = jnp.linalg.eigh(jnp.asarray(M, dtype=dt))
        w, v = np.asarray(w_j, dtype=np.float64), np.asarray(v_j, dtype=np.float64)
        evals = w[:, :n_ev] - shifts[:, None]
        evecs = v[:, :, :n_ev]
    else:
        w, v = np.linalg.eigh(M.astype(host_dtype))
        w, v = w.astype(np.float64), v.astype(np.float64)
        evals = w[:, :n_ev] - shifts[:, None]
        evecs = v[:, :, :n_ev]
    evecs = evecs * batch.valid[:, :, None]
    return evals, evecs
