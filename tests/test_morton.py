"""Morton (Z-order) sorting: key correctness + invariance of evaluation.

Measured NEGATIVE result kept in-tree (scripts + docs/KERNELS.md): Z-order
tiles RAISE tile-mask density vs the plain coordinate-0 sort at every
production scale (2D leapfrog 0.60 -> 0.85, 3D ring_collide 0.13 -> 0.44)
because the mask dilation radius dominates tile extents — thin x-slabs
cull one dimension hard, compact cubes cull all dimensions weakly. The
module stays as the measured record and for future small-radius regimes.
"""

import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field, morton


def _ref_key(q, d):
    """Bit-by-bit interleave oracle."""
    out = 0
    nbits = 16 if d == 2 else 10
    for bit in range(nbits):
        for dim in range(d):
            out |= ((int(q[dim]) >> bit) & 1) << (bit * d + dim)
    return out


def test_morton_key_matches_bitwise_oracle():
    rng = np.random.RandomState(0)
    for d in (2, 3):
        lo = jnp.zeros((d,))
        hi = jnp.ones((d,))
        x = rng.uniform(0, 1, (64, d)).astype(np.float32)
        keys = np.asarray(morton.morton_key(jnp.asarray(x), lo, hi))
        scale = 65536.0 if d == 2 else 1024.0
        cap = 65535 if d == 2 else 1023
        for row, k in zip(x, keys):
            q = np.minimum((row * scale).astype(np.uint64), cap)
            assert int(k) == _ref_key(q, d)


def test_morton_order_groups_spatially():
    # points on a 16x16 grid: any 4 consecutive rows of the z-order share a
    # 2x2 cell, so consecutive-pair distances are bounded by the cell size
    xs = np.linspace(0.0, 1.0, 16, dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    order = np.asarray(morton.morton_order(jnp.asarray(pts)))
    s = pts[order]
    quads = s.reshape(-1, 4, 2)
    extents = quads.max(axis=1) - quads.min(axis=1)
    assert float(extents.max()) <= 1.0 / 15.0 + 1e-6


def test_morton_sort_preserves_field_and_dead_rows_last():
    rng = np.random.RandomState(3)
    spec = FieldSpec.create((-5, -5), (5, 5), 90, d=2, vdim=2)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (90, 2)), spec)
    vals = jnp.asarray(rng.randn(*mix.values.shape).astype(np.float32)
                       * np.asarray(mix.alive)[:, None])
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          vals, mix.alive)
    order = morton.morton_order(mix.positions, mix.alive)
    ms = GaussianMixture(mix.positions[order], mix.scalings[order],
                         mix.rotations[order], mix.values[order],
                         mix.alive[order])
    alive = np.asarray(ms.alive)
    n = alive.sum()
    assert alive[:n].all() and not alive[n:].any()
    x = jnp.asarray(rng.uniform(-4, 4, (40, 2)), jnp.float32)
    v1, j1 = field.value_and_jac_dense(mix, spec, x)
    v2, j2 = field.value_and_jac_dense(ms, spec, x)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(j1), rtol=1e-5,
                               atol=1e-6)


def test_max_corner_point_does_not_collide_with_dead_sentinel():
    # a live point at the bounding-box max corner has raw key 0xFFFFFFFF
    # in 2D — it must still sort before dead rows
    pts = np.array([[1.0, 1.0], [0.0, 0.0], [0.5, 0.5], [9.9, 9.9]],
                   np.float32)
    valid = jnp.asarray([True, True, True, False])
    order = np.asarray(morton.morton_order(jnp.asarray(pts), valid))
    assert order[-1] == 3  # the dead row sorts last
    v = np.asarray(valid)[order]
    assert v[:3].all() and not v[3:].any()


def test_numpy_and_jax_orders_agree():
    rng = np.random.RandomState(11)
    for d in (2, 3):
        x = rng.uniform(-3, 7, (200, d)).astype(np.float32)
        a = np.asarray(morton.morton_order(jnp.asarray(x)))
        b = morton.morton_order_np(x)
        # keys (not necessarily permutations — ties) must order identically
        np.testing.assert_array_equal(x[a], x[b])
