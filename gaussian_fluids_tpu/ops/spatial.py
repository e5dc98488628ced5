"""Spatial sort keys and block-sparse work lists for the tiled kernels.

Why: the centered Pallas backend culls (query-tile x gaussian-tile) pairs
by bounding box (ops/field.py _tile_mask). Culling quality is set entirely
by how spatially compact the tiles are, i.e. by the order queries and
Gaussians are sorted in before tiling:

* 1D coordinate sort (round 1-3): tiles are thin slabs — near-optimal in
  2D (a slab IS compact in the only unsortable axis), but useless for y/z
  culling in 3D. Measured at ring_collide production scale the x-sorted
  tile mask touches 42-70x more pairs than the reference's 27-cell walk
  (BASELINE.md "3D-scale bound").
* Morton (Z-order) sort (round 4, 3D): consecutive keys trace a
  space-filling curve, so a run of tb/tn consecutive rows occupies a
  compact ~cube whose bbox side scales as (run/total)^(1/3). This is the
  TPU-native analog of the reference's uniform cell grid
  (3D/GSR.py:205-252): instead of walking 27 cells per query, whole
  query-tiles skip whole gaussian-tiles that no cell walk would pair.

The flat work list (`flat_work_list`) compacts a boolean tile mask into
(row, col) work items so a Pallas kernel can run a grid over exactly the
live tile pairs (plus one keep-alive item per empty row, so every output
block is visited) instead of a full (rows x cols) grid of mostly-skipped
steps — the fine-granularity regime where even skipped steps would
dominate (BASELINE.md banded-sweep experiment, extended).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each int32 lane 3 apart (Morton 3D)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _spread2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 16 bits of each int32 lane 2 apart (Morton 2D)."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_key(x: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """(B,) int32 Z-order key of points ``x`` (B, d) on a 2^bits-per-axis
    lattice over [lo, hi] (10 bits/axis in 3D -> 30 bits; 15 in 2D -> 30
    bits, NOT 16: y's top bit would land in the int32 sign bit and order
    upper-half-y points first — ADVICE r4). Points outside the box clamp
    to the boundary lattice cells — fine for sorting (out-of-domain
    points cluster at the faces they exit)."""
    d = x.shape[-1]
    bits = 10 if d == 3 else 15
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    scale = (2.0 ** bits) / jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((x - lo) * scale, 0.0, 2.0 ** bits - 1.0).astype(jnp.int32)
    if d == 3:
        return (_spread3(q[..., 0]) | (_spread3(q[..., 1]) << 1)
                | (_spread3(q[..., 2]) << 2))
    if d == 2:
        return _spread2(q[..., 0]) | (_spread2(q[..., 1]) << 1)
    raise ValueError(f"morton_key: d must be 2 or 3, got {d}")


def sort_key(x: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """The canonical spatial sort key for tiled-kernel inputs: raw
    coordinate 0 in every dimension.

    MEASURED NEGATIVE (round 4, ring_collide frame-20 checkpoint, one
    v5e chip): Morton keys in 3D only pay at FINE tiles (35M pairs at
    8x128 vs ~70M for x-sorted 256x512), but fine-tile work-list kernels
    cost 0.4-1 us of fixed overhead per (8-16, 128) grid step — fwd
    11-16 ms / dual-backward 25-39 ms versus 3.5 / 7.6 ms for the
    coarse masked sweep. At coarse tiles Morton is strictly WORSE than
    x-slabs (density 0.37 vs 0.13 at 256x512: octant-straddling runs +
    the support dilation dominate the Minkowski sum). The production
    sort is therefore x everywhere; the win that survived is work-list
    compaction of the COARSE mask (ops/field.py cells backend, zero
    skipped steps: fwd 2.1 ms, dual-backward 5.7 ms). `morton_key`
    stays for experiments (GF_SPATIAL_KEY=morton)."""
    import os
    if x.shape[-1] == 3 and os.environ.get("GF_SPATIAL_KEY") == "morton":
        return morton_key(x, lo, hi)
    return x[..., 0]


def sort_queries(x: jnp.ndarray, lo, hi) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x_sorted, inverse_permutation) under :func:`sort_key`."""
    order = jnp.argsort(sort_key(x, lo, hi))
    return x[order], jnp.argsort(order)


def sort_key_np(x) -> "np.ndarray":
    """Host-side (numpy) twin of :func:`sort_key`. Coordinate 0 by
    default (exactly :func:`sort_key`); Morton in 3D only under
    GF_SPATIAL_KEY=morton, where the lattice bounds come from ``x``'s own
    min/max — exact key agreement with ``spatially_sorted`` (alive-masked
    bounds) therefore only holds when ``x`` contains alive rows only,
    which is the sole callsite's invariant (solver/clone.py:154 sorts the
    freshly rebuilt, unpadded arrays). With mismatched bounds the two can
    order identical points differently — a perf-only effect (looser tile
    masks until the next frame-boundary re-sort), never a correctness one
    (ADVICE r4)."""
    import os
    import numpy as np
    x = np.asarray(x)
    if x.shape[-1] != 3 or os.environ.get("GF_SPATIAL_KEY") != "morton":
        return x[..., 0]
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    scale = (2.0 ** 10) / np.maximum(hi - lo, 1e-30)
    q = np.clip((x - lo) * scale, 0.0, 2.0 ** 10 - 1.0).astype(np.int32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


def flat_work_list(mask: jnp.ndarray, cap: int):
    """Compact a (R, C) boolean tile mask into a flat work list.

    Returns (rows, cols, ok):
      rows (cap,) i32 — work item w touches row ``rows[w]``; row-sorted,
        every row in [0, R) appears at least once (empty and overflow
        padding items carry ``cols[w] == -1``), so a Pallas kernel whose
        output block index is ``rows[w]`` visits (and can zero) every
        output block exactly once per run of equal rows.
      cols (cap,) i32 — the live column, or -1 for a keep-alive/padding
        item (kernels must skip compute; the index map clips to 0).
      ok () bool — True iff sum(max(count_i, 1)) <= cap. On False the
        list still satisfies the structural guarantees above (the tail is
        truncated row-coverage only), but live items are missing: callers
        MUST fall back to the full masked sweep (lax.cond), mirroring the
        banded kernel's guard (ops/field.py value_banded).
    """
    r, c = mask.shape
    cnt = jnp.sum(mask, axis=1)
    cnt1 = jnp.maximum(cnt, 1)           # keep-alive for empty rows
    total = jnp.sum(cnt1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), cnt1.dtype), jnp.cumsum(cnt1)[:-1]])
    # per-row live columns, compacted left (stable)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    jsorted = jnp.sort(jnp.where(mask, col_ids, c), axis=1)
    w = jnp.arange(cap)
    row = jnp.clip(jnp.searchsorted(starts, w, side="right") - 1, 0, r - 1)
    within = w - starts[row]
    j = jsorted[row, jnp.clip(within, 0, c - 1)]
    live = (within < cnt[row]) & (w < total) & (j < c)
    # overflow/after-total padding: stay on the LAST row (row is already
    # clipped there) so no fresh output block opens un-zeroed
    rows = jnp.where(w < total, row, r - 1).astype(jnp.int32)
    cols = jnp.where(live, j, -1).astype(jnp.int32)
    ok = total <= cap
    return rows, cols, ok
