"""Transfer-formulation experiments (history + the one runnable race).

Collapses the round-2 exp_transfer{,0,0b,2,3}.py family (round-2 verdict,
hygiene item #10).  Conclusions, measured at the bench shape (65^3 grid,
4^3 blocks, 2 eigenvectors, v5e, f32):

  round-2 candidates (all superseded):
    * per-window strided-slice loop (125 slice kernels): latency-bound.
    * corner-subset blocked-reshape einsums (2^dim terms): 185 us restrict /
      310 us pair — relayout-bound concats; was the production path until
      round 3.
    * conv_general_dilated_patches im2col: 3.3 ms — pathological on TPU.
    * dense R matmul: memory-bound on the dense operator (only used for the
      small deep-level transfers, DENSE_TRANSFER_MAX_ELEMS).

  round-3 production path (ops/structured_transfer.py):
    * per-axis SELECTION MATMULS materialize the overlapped windows on the
      MXU (Precision.HIGHEST — the TPU einsum default is bf16 multiplies,
      7e-3 error), then one fused mul-reduce against the weights:
      75 us restrict / 214 us pair.
    * storing W interleaved ((a0,t0,a1,t1,...,e)) won another ~20 us in
      ISOLATION but regressed the full V-cycle 0.43 -> 0.53 ms (XLA layout
      choices do not compose across fusion boundaries) — REVERTED; micro
      wins must be re-validated inside the full cycle.

Run:  python scripts/exp_transfers.py   (times current restrict/prolong on
the attached backend at the bench shape)
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mfmg_tpu import Config, Hierarchy, LaplaceProblem
    from mfmg_tpu.config import AgglomerationConfig, CoarseConfig, SmootherConfig
    from mfmg_tpu.ops.structured_transfer import (structured_prolong,
                                                  structured_restrict)

    prob = LaplaceProblem.hyper_cube(3, 6, material_property="linear")
    cfg = Config(operator="stencil", dtype="float32", max_levels=3,
                 smoother=SmootherConfig(type="chebyshev", degree=2),
                 agglomeration=AgglomerationConfig(nx=4, ny=4, nz=4),
                 coarse=CoarseConfig(type="direct"))
    tr = Hierarchy(prob, cfg).levels[0].transfer
    n = prob.n_dofs

    def timeit(fn, name, NLO=100, NHI=1000):
        @partial(jax.jit, static_argnames=("nn",))
        def loop(x, nn):
            return jax.lax.fori_loop(0, nn, lambda i, v: fn(v), x)

        def run(nn):
            v = jnp.asarray(np.random.default_rng(int(time.time() * 1e6) % 2**31)
                            .uniform(size=n).astype(np.float32))
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            out = loop(v, nn)
            assert np.isfinite(float(jnp.vdot(out, out)))
            return time.perf_counter() - t0

        run(NLO), run(NHI)
        sl = []
        for _ in range(3):
            lo, hi = run(NLO), run(NHI)
            if 0 < lo < hi:
                sl.append((hi - lo) / (NHI - NLO))
        print(f"{name}: {float(np.median(sl))*1e6:.1f} us", flush=True)

    timeit(lambda v: structured_prolong(tr, structured_restrict(tr, v)) / 3.0,
           "restrict+prolong pair")


if __name__ == "__main__":
    main()
