#!/usr/bin/env python
"""Decision experiment for a banded TRAINING sweep (VERDICT round-1 next #4).

The centered masked kernels pay a grid step (incl. block DMA issue) for
every (B-tile, N-tile) pair and skip only the compute body where the tile
mask is 0 (ops/pallas/gsr_centered.py `@pl.when(tmask...)`). At
ring_collide production scale the mask is ~0.13 dense, so ~87% of grid
steps do no compute. A banded kernel (scalar-prefetch window like
fused_gsr_value_banded, extended to val+jac and the dual backward) would
eliminate most skipped steps — IF they cost anything.

This script bounds that win without building the kernels:
  A. forward + dual backward with the REAL tile mask (production today)
  B. same shapes, ALL-ONES mask (worst case: every step computes)
  C. N compacted to ceil(density * nnt) tiles, all-ones mask — the ideal
     "every step is a real step" banded bound (same number of compute
     bodies as A, zero skipped steps)

If A ~= C, skipped steps are free and banding is a negative result.
The gap A - C is the ceiling a banded training sweep can recover.

Usage: python scripts/bench_band_potential.py [ckpt.pt] [B] [iters]
Defaults: output_3d_ring_collide/gaussian_velocity_10.pt, B=8192, 50.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        "output_3d_ring_collide/gaussian_velocity_10.pt"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    from gaussian_fluids_tpu.io import checkpoint
    from gaussian_fluids_tpu.ops import field as field_ops
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import (
        _fwd, fused_gsr_centered_bwd2)

    mix, spec = checkpoint.load_checkpoint(ckpt)
    mix = mix.spatially_sorted()
    d, vdim = mix.d, mix.vdim
    tb, tn = 256, 512
    rng = np.random.RandomState(0)
    x = rng.uniform(spec.lo, spec.hi, (B, d)).astype(np.float32)
    x = x[np.argsort(x[:, 0])]
    x_p, b, inv, mu_p, pp_p, v_p, tmask = field_ops._centered_prep(
        mix, spec, jnp.asarray(x), tb, tn, presorted=True)
    tmask = jax.device_get(tmask)
    nbt, nnt = tmask.shape
    density = float(tmask.mean())
    # per-B-tile window width the banded kernel would need (first..last
    # interacting N-tile), and its mean — the banded grid is nbt * max_w
    first = np.argmax(tmask, axis=1)
    last = nnt - 1 - np.argmax(tmask[:, ::-1], axis=1)
    width = np.where(tmask.any(axis=1), last - first + 1, 0)
    print(f"N={mix.capacity} B={B} tiles={nbt}x{nnt} density={density:.3f} "
          f"window width max={width.max()} mean={width.mean():.1f} "
          f"(banded grid would be {nbt}x{width.max()} = "
          f"{nbt * width.max()} steps vs {nbt * nnt})")

    clamp = float(spec.clamp_threshold)
    cols = (1 + d) * vdim
    key = jax.random.PRNGKey(0)
    dout1 = jax.random.normal(key, (x_p.shape[0], cols), jnp.float32)
    dout2 = jax.random.normal(key, (x_p.shape[0], cols), jnp.float32)

    ones = jnp.ones_like(jnp.asarray(tmask))
    muT, ppT = mu_p.T, pp_p.T

    # C: compact to the same number of COMPUTE bodies as A, all steps live.
    live_tiles = int(tmask.sum(axis=1).max())  # per-B-tile worst case
    ncomp = live_tiles * tn
    muTc, ppTc, vc = muT[:, :ncomp], ppT[:, :ncomp], v_p[:ncomp]
    onesc = jnp.ones((nbt, live_tiles), jnp.int32)

    fwd = jax.jit(lambda tm, mt, pt, v: _fwd(
        tm, x_p, mt, pt, v, d, vdim, clamp, tb, tn, d))
    bwd2 = jax.jit(lambda tm, mt, pt, v: fused_gsr_centered_bwd2(
        tm, x_p, mt, pt, v, dout1, dout2, d, vdim, clamp, tb, tn))

    def timeit(name, f, *args):
        r = f(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[tuple(0 for _ in a.shape)]), r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[tuple(0 for _ in a.shape)]), r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt * 1e3:8.3f} ms")
        return dt

    ta_f = timeit("fwd  A real mask", fwd, jnp.asarray(tmask), muT, ppT, v_p)
    tb_f = timeit("fwd  B all-ones", fwd, ones, muT, ppT, v_p)
    tc_f = timeit(f"fwd  C compact N={ncomp}", fwd, onesc, muTc, ppTc, vc)
    ta_b = timeit("bwd2 A real mask", bwd2, jnp.asarray(tmask), muT, ppT,
                  v_p)
    tb_b = timeit("bwd2 B all-ones", bwd2, ones, muT, ppT, v_p)
    tc_b = timeit(f"bwd2 C compact N={ncomp}", bwd2, onesc, muTc, ppTc, vc)
    print(f"banded ceiling: fwd {ta_f / tc_f:.2f}x, bwd2 {ta_b / tc_b:.2f}x "
          f"(mask saves {tb_f / ta_f:.2f}x / {tb_b / ta_b:.2f}x today)")


if __name__ == "__main__":
    main()
