"""Standalone probe: pallas_cheb_smooth_tiled at 129^3 on the real chip —
correctness vs the XLA path on random planes + timing, without a hierarchy
setup.  Usage: python scripts/exp_cheb_tiled.py [n_tiles]"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mfmg_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mfmg_tpu.ops.pallas_stencil import (cheb_tiled_geom, pad_planes_cheb,
                                         pad_vec_cheb, pad_vec_cheb_host,
                                         pallas_cheb_smooth_tiled,
                                         pick_cheb_tiles, unpad_vec_cheb)
from mfmg_tpu.ops.fused_cycle import _cheb_coeffs


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 129
    grid = (g, g, g)
    import itertools
    offsets = tuple(itertools.product((-1, 0, 1), repeat=3))
    # symmetric positive offsets: first nonzero > 0
    def pos(off):
        for c in off:
            if c:
                return c > 0
        return False
    sym_pos = tuple(i for i, o in enumerate(offsets) if pos(o))
    n_planes = 1 + len(sym_pos)
    nt_default = pick_cheb_tiles(grid, n_planes, 2)
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else nt_default
    log(f"grid {grid}, n_planes {n_planes}, n_tiles {n_tiles} "
        f"(pick said {nt_default}); geom {cheb_tiled_geom(grid, n_tiles)}")

    rng = np.random.default_rng(0)
    nf = g * g
    # random symmetric-ish planes (correctness only needs consistency between
    # the two implementations, not operator symmetry of the underlying matrix
    # -- both read the same (center+positive, pair-mirrored) planes)
    coeffs = rng.standard_normal((len(offsets), g, g, g)).astype(np.float32)
    alphas, betas = _cheb_coeffs(1.1, 0.9, 2)
    coef = jnp.asarray(np.asarray(alphas + betas, np.float32))
    cpt = pad_planes_cheb(coeffs.astype(jnp.bfloat16), offsets, grid, sym_pos,
                          n_tiles=n_tiles)
    x = rng.standard_normal(g**3).astype(np.float32)
    b = rng.standard_normal(g**3).astype(np.float32)
    invd = rng.uniform(0.5, 1.5, g**3).astype(np.float32)
    invd_p = pad_vec_cheb_host(invd, grid, n_tiles)
    xd, bd = jnp.asarray(x), jnp.asarray(b)

    t0 = time.perf_counter()
    xp = pad_vec_cheb(xd, grid, n_tiles)
    bp = pad_vec_cheb(bd, grid, n_tiles)
    outs = pallas_cheb_smooth_tiled(cpt, xp, bp, invd_p, coef, offsets, grid,
                                    sym_pos, 2, want_res=True,
                                    n_tiles=n_tiles)
    ys = [unpad_vec_cheb(o, grid) for o in outs]
    jax.block_until_ready(ys)
    log(f"compile+run {time.perf_counter()-t0:.1f}s; finite: "
        f"{[bool(jnp.isfinite(jnp.vdot(y, y))) for y in ys]}")

    # timing: two-point
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def loop(cpt, xp, bp, invd_p, n):
        def body(i, xp):
            outs = pallas_cheb_smooth_tiled(cpt, xp, bp, invd_p, coef,
                                            offsets, grid, sym_pos, 2,
                                            want_res=True, n_tiles=n_tiles)
            return pad_vec_cheb(unpad_vec_cheb(outs[0], grid) / 27.0, grid,
                                n_tiles)
        return jax.lax.fori_loop(0, n, body, xp)

    def timed(n):
        v = pad_vec_cheb(jnp.asarray(
            rng.standard_normal(g**3).astype(np.float32)), grid, n_tiles)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        out = loop(cpt, v, bp, invd_p, n)
        assert np.isfinite(float(jnp.vdot(out, out)))
        return time.perf_counter() - t0

    timed(5), timed(40)
    sl = []
    for _ in range(6):
        tl, th = timed(5), timed(40)
        if 0 < tl < th:
            sl.append((th - tl) / 35)
        if len(sl) >= 3:
            break
    log(f"fused cheb smooth(+res): {np.median(sl)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
