"""Morton (Z-order) spatial sorting for the block-sparse kernel backend.

**Status: measured NEGATIVE result, intentionally NOT wired into any
production path** (docs/KERNELS.md, tests/test_morton.py). The centered
Pallas kernel skips (query-tile x gaussian-tile) pairs whose bounding
boxes cannot interact (ops/field.py `_tile_mask`); the test is exact in
all dimensions, and the hypothesis was that Z-order tiles (compact in
every dimension) would cull better than plain coordinate-0 slabs (thin in
one dimension). Measured at production scales the OPPOSITE holds — mask
density leapfrog-2D 0.60 -> 0.85, karman 0.53 -> 0.72, ring_collide-3D
0.13 -> 0.44 — because the mask's support-radius dilation dominates tile
extents, so one hard-culled dimension beats d weakly-culled ones. Every
production sort therefore remains `argsort(x[:, 0])` (and the banded
density kernel structurally requires it). The module is kept as the
measured record and for future small-radius regimes.

Keys: positions are normalized to the data's own bounding box, quantized
to 16 (2D) / 10 (3D) bits per dimension, and bit-interleaved into a
uint32 via the standard parallel-prefix spreads.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

_U = jnp.uint32


def _part1by1(x):
    """Spread 16 bits of x to the even bit positions (x -> x_0 0 x_1 0 ...)."""
    x = x & _U(0x0000FFFF)
    x = (x | (x << 8)) & _U(0x00FF00FF)
    x = (x | (x << 4)) & _U(0x0F0F0F0F)
    x = (x | (x << 2)) & _U(0x33333333)
    x = (x | (x << 1)) & _U(0x55555555)
    return x


def _part1by2(x):
    """Spread 10 bits of x to every third bit position."""
    x = x & _U(0x000003FF)
    x = (x | (x << 16)) & _U(0x030000FF)
    x = (x | (x << 8)) & _U(0x0300F00F)
    x = (x | (x << 4)) & _U(0x030C30C3)
    x = (x | (x << 2)) & _U(0x09249249)
    return x


def morton_key(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
               ) -> jnp.ndarray:
    """(B,) uint32 Z-order key of points x (B, d) within box [lo, hi].

    Points outside the box are clamped onto it (their keys collapse to the
    boundary cells — ordering degrades gracefully, correctness is
    unaffected since the tile mask is exact for any order).
    """
    d = x.shape[-1]
    span = jnp.maximum(hi - lo, 1e-6)
    u = jnp.clip((x - lo) / span, 0.0, 1.0)
    if d == 2:
        q = jnp.minimum((u * 65536.0).astype(_U), _U(65535))
        return (_part1by1(q[..., 1]) << 1) | _part1by1(q[..., 0])
    if d == 3:
        q = jnp.minimum((u * 1024.0).astype(_U), _U(1023))
        return ((_part1by2(q[..., 2]) << 2) | (_part1by2(q[..., 1]) << 1)
                | _part1by2(q[..., 0]))
    raise ValueError(f"morton_key supports d in (2, 3); got {d}")


def morton_order(x: jnp.ndarray, valid: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """Permutation sorting rows of x (B, d) along the Z-order curve of
    their own bounding box; rows with ``valid == False`` sort last.
    Jittable (the box is data-dependent, which is fine — keys only affect
    ordering)."""
    if valid is not None:
        v = valid[:, None]
        lo = jnp.min(jnp.where(v, x, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(v, x, -jnp.inf), axis=0)
        # empty/degenerate boxes: fall back to zeros (any order is correct)
        ok = jnp.isfinite(lo) & jnp.isfinite(hi)
        lo = jnp.where(ok, lo, 0.0)
        hi = jnp.where(ok, hi, 1.0)
    else:
        lo = jnp.min(x, axis=0)
        hi = jnp.max(x, axis=0)
    key = morton_key(x, lo, hi)
    if valid is not None:
        # live keys are capped below the dead sentinel: the point at the
        # bounding-box max corner otherwise produces exactly 0xFFFFFFFF in
        # 2D (interleave(65535, 65535)) and would interleave with dead rows
        key = jnp.where(valid, jnp.minimum(key, _U(0xFFFFFFFE)),
                        _U(0xFFFFFFFF))
    # stable sort keeps equal-key (e.g. dead) rows in original order
    return jnp.argsort(key, stable=True)


def sort_queries(x: jnp.ndarray) -> jnp.ndarray:
    """x reordered along the Z-order curve — the per-epoch query sort for
    the block-sparse backend (drop-in for ``x[argsort(x[:, 0])]``; callers
    pass ``presorted=True`` downstream, whose only contract is spatial
    coherence, never correctness)."""
    return x[morton_order(x)]


def morton_order_np(x: np.ndarray) -> np.ndarray:
    """Host-side numpy twin of :func:`morton_order` (no valid mask).
    No production consumer — kept alongside the jax version so a future
    small-radius regime can adopt Z-ordering on both the jit and host
    re-packing paths without rederiving the spreads."""
    x = np.asarray(x, np.float32)   # f32 to match the jax twin bit-for-bit
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    span = np.maximum(hi - lo, np.float32(1e-6))
    u = np.clip((x - lo) / span, np.float32(0.0), np.float32(1.0))
    d = x.shape[-1]

    def spread1(q):
        q = q.astype(np.uint32) & 0x0000FFFF
        q = (q | (q << 8)) & 0x00FF00FF
        q = (q | (q << 4)) & 0x0F0F0F0F
        q = (q | (q << 2)) & 0x33333333
        q = (q | (q << 1)) & 0x55555555
        return q

    def spread2(q):
        q = q.astype(np.uint32) & 0x000003FF
        q = (q | (q << 16)) & 0x030000FF
        q = (q | (q << 8)) & 0x0300F00F
        q = (q | (q << 4)) & 0x030C30C3
        q = (q | (q << 2)) & 0x09249249
        return q

    if d == 2:
        q = np.minimum((u * 65536.0).astype(np.uint32), 65535)
        key = (spread1(q[:, 1]) << 1) | spread1(q[:, 0])
    elif d == 3:
        q = np.minimum((u * 1024.0).astype(np.uint32), 1023)
        key = ((spread2(q[:, 2]) << 2) | (spread2(q[:, 1]) << 1)
               | spread2(q[:, 0]))
    else:
        raise ValueError(f"morton_order_np supports d in (2, 3); got {d}")
    return np.argsort(key, kind="stable")
