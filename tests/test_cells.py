"""Work-list (cell-culled) backend parity: Morton keys, flat work lists,
and the gsr_cells kernels must reproduce the dense masked sum exactly
(same mask semantics; float reduction order may differ) — values,
Jacobians, two-head gradients, and the guard fallback."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field, spatial


def _mix3(n=500, seed=0, cap_extra=0):
    r = np.random.RandomState(seed)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mix = GaussianMixture.create(r.uniform(0.02, 0.98, (n, 3)), spec)
    p = mix.params()
    p["scalings"] = p["scalings"] + 0.5 \
        + 0.2 * jnp.asarray(r.randn(*p["scalings"].shape), jnp.float32)
    p["rotations"] = jnp.asarray(r.randn(*p["rotations"].shape),
                                 jnp.float32)
    p["values"] = jnp.asarray(r.randn(*p["values"].shape), jnp.float32)
    mix = mix.with_params(p).spatially_sorted()
    return mix, spec


def _sorted_queries(r, b, lo=-0.02, hi=1.02):
    x = jnp.asarray(r.uniform(lo, hi, (b, 3)).astype(np.float32))
    return x[jnp.argsort(spatial.sort_key(x, (0, 0, 0), (1, 1, 1)))]


# ---- morton key ----

def test_morton_key_octant_order():
    # the 8 octant corners of the unit cube in Z-order
    pts = jnp.asarray([[x, y, z] for z in (0.1, 0.9) for y in (0.1, 0.9)
                       for x in (0.1, 0.9)], jnp.float32)
    keys = spatial.morton_key(pts, (0, 0, 0), (1, 1, 1))
    assert bool(jnp.all(jnp.argsort(keys) == jnp.arange(8)))


def test_cells_tiles_nondivisor_raises_clearly(monkeypatch):
    """ADVICE r4: a tile size that doesn't divide the coarse fallback
    block must raise a clear ValueError naming the env var, not an opaque
    reshape error at trace time."""
    monkeypatch.setenv("GF_CELLS_TB", "96")
    with pytest.raises(ValueError, match="GF_CELLS_TB=96"):
        field._cells_tiles(3)
    monkeypatch.setenv("GF_CELLS_TB", "128")
    monkeypatch.setenv("GF_CELLS_TN", "384")
    with pytest.raises(ValueError, match="GF_CELLS_TN=384"):
        field._cells_tiles(3)
    monkeypatch.setenv("GF_CELLS_TN", "256")
    assert field._cells_tiles(3) == (128, 256)


def test_morton_key_2d_nonnegative_and_ordered():
    """ADVICE r4: 16 bits/axis in 2D pushed y's top bit into the int32
    sign bit, so upper-half-y points sorted FIRST; 15 bits keeps the key
    non-negative and Z-ordered."""
    r = np.random.RandomState(0)
    pts = jnp.asarray(r.uniform(0, 1, (512, 2)).astype(np.float32))
    keys = spatial.morton_key(pts, (0, 0), (1, 1))
    assert np.all(np.asarray(keys) >= 0)
    quad = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9], [0.9, 0.9]],
                       jnp.float32)
    qk = spatial.morton_key(quad, (0, 0), (1, 1))
    assert bool(jnp.all(jnp.argsort(qk) == jnp.arange(4)))


def test_morton_sorted_runs_are_compact():
    """Consecutive Morton runs must have much smaller bboxes than
    x-sorted runs of the same length (the whole point)."""
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(0, 1, (4096, 3)).astype(np.float32))
    xm = x[jnp.argsort(spatial.morton_key(x, (0, 0, 0), (1, 1, 1)))]
    xx = x[jnp.argsort(x[:, 0])]

    def mean_dilated_vol(a, run=8, r=0.05):
        # what tile culling actually pays: the support-dilated bbox
        # volume (a thin x-slab has near-zero raw volume but still
        # intersects everything in y/z). Fine runs, like the fine tiles
        # the cells backend uses — at coarse runs Z-curve octant
        # straddling eats the advantage.
        a = np.asarray(a).reshape(-1, run, 3)
        ext = a.max(axis=1) - a.min(axis=1) + 2 * r
        return float(np.prod(ext, axis=-1).mean())

    assert mean_dilated_vol(xm) < 0.5 * mean_dilated_vol(xx)


def test_sort_key_np_matches_device_ordering(monkeypatch):
    monkeypatch.setenv("GF_SPATIAL_KEY", "morton")  # the opt-in 3D key
    r = np.random.RandomState(1)
    x = r.uniform(-2, 3, (257, 3)).astype(np.float32)
    k_np = spatial.sort_key_np(x)
    k_dev = spatial.morton_key(jnp.asarray(x), x.min(0), x.max(0))
    assert np.array_equal(np.argsort(k_np, kind="stable"),
                          np.asarray(jnp.argsort(jnp.asarray(k_np),
                                                 stable=True)))
    # same lattice, same bounds -> identical keys
    assert np.array_equal(k_np, np.asarray(k_dev))


# ---- flat work list ----

def test_flat_work_list_structure():
    r = np.random.RandomState(2)
    mask = jnp.asarray(r.rand(13, 29) < 0.2)
    cap = int(jnp.sum(jnp.maximum(mask.sum(1), 1))) + 5
    rows, cols, ok = spatial.flat_work_list(mask, cap)
    assert bool(ok)
    rows_np, cols_np = np.asarray(rows), np.asarray(cols)
    # row-sorted, every row present
    assert np.all(np.diff(rows_np) >= 0)
    assert set(range(13)) <= set(rows_np.tolist())
    # live items reconstruct the mask exactly
    rec = np.zeros((13, 29), bool)
    live = cols_np >= 0
    rec[rows_np[live], cols_np[live]] = True
    assert np.array_equal(rec, np.asarray(mask))
    assert live.sum() == int(mask.sum())


def test_flat_work_list_overflow_flag():
    mask = jnp.ones((4, 8), bool)
    rows, cols, ok = spatial.flat_work_list(mask, 16)   # needs 32
    assert not bool(ok)
    # still row-sorted and in range (structural safety for the kernel)
    assert np.all(np.diff(np.asarray(rows)) >= 0)
    assert np.asarray(rows).max() <= 3


def test_flat_work_list_empty_rows_keepalive():
    mask = jnp.zeros((5, 7), bool).at[2, 3].set(True)
    rows, cols, ok = spatial.flat_work_list(mask, 8)
    assert bool(ok)
    rows_np, cols_np = np.asarray(rows), np.asarray(cols)
    assert set(range(5)) <= set(rows_np.tolist())
    assert (cols_np >= 0).sum() == 1


# ---- kernel parity (interpret mode on CPU) ----

@pytest.fixture()
def cells_env(monkeypatch):
    monkeypatch.setenv("GF_FIELD_BACKEND", "cells")
    monkeypatch.setenv("GF_CELLS_TB", "8")
    monkeypatch.setenv("GF_CELLS_TN", "128")
    monkeypatch.setenv("GF_CELLS_CAP", "0.5")


def test_cells_value_jac_matches_dense(cells_env):
    mix, spec = _mix3()
    r = np.random.RandomState(3)
    x = _sorted_queries(r, 256)
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vc, jc = field.value_and_jac(mix, spec, x, presorted=True,
                                 need_dx=False)
    # wide-overlap mixture: sums of ~100s of pairs differ by reduction
    # order only (tile accumulation vs HIGHEST matmul)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vd), rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jd), rtol=2e-4,
                               atol=1e-3)
    v2 = field.value(mix, spec, x, presorted=True, need_dx=False)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vc), rtol=1e-6,
                               atol=1e-7)


def test_cells_value_jac_unsorted_queries(cells_env):
    """presorted=False must Morton-sort internally and unsort results."""
    mix, spec = _mix3(seed=5)
    r = np.random.RandomState(6)
    x = jnp.asarray(r.uniform(-0.02, 1.02, (192, 3)).astype(np.float32))
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vc, jc = field.value_and_jac(mix, spec, x, presorted=False,
                                 need_dx=False)
    # wide-overlap mixture: sums of ~100s of pairs differ by reduction
    # order only (tile accumulation vs HIGHEST matmul)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vd), rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jd), rtol=2e-4,
                               atol=1e-3)


def test_cells_cap_overflow_falls_back_exactly(cells_env, monkeypatch):
    """A tiny capacity must flip to the full masked sweep, not drop
    contributions."""
    monkeypatch.setenv("GF_CELLS_CAP", "0.0001")
    mix, spec = _mix3(seed=7)
    r = np.random.RandomState(8)
    x = _sorted_queries(r, 128)
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vc, jc = field.value_and_jac(mix, spec, x, presorted=True,
                                 need_dx=False)
    # wide-overlap mixture: sums of ~100s of pairs differ by reduction
    # order only (tile accumulation vs HIGHEST matmul)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vd), rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jd), rtol=2e-4,
                               atol=1e-3)


def test_cells_gradients_match_dense(cells_env):
    """Parameter gradients through the work-list VJP (clone-style loss)
    vs the dense path's JAX AD."""
    mix, spec = _mix3(seed=9, n=300)
    r = np.random.RandomState(10)
    x = _sorted_queries(r, 64, 0.0, 1.0)
    ref_v = jnp.asarray(r.randn(64, 3), jnp.float32)
    ref_j = jnp.asarray(r.randn(64, 3, 3), jnp.float32)
    alive = mix.alive

    def loss_cells(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], alive)
        v, j = field.value_and_jac(m, spec, x, presorted=True,
                                   need_dx=False)
        return jnp.mean(jnp.abs(v - ref_v)) + jnp.mean(jnp.abs(j - ref_j))

    def loss_dense(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], alive)
        v, j = field.value_and_jac_dense(m, spec, x)
        return jnp.mean(jnp.abs(v - ref_v)) + jnp.mean(jnp.abs(j - ref_j))

    p = mix.params()
    gc = jax.grad(loss_cells)(p)
    gd = jax.grad(loss_dense)(p)
    for k in p:
        np.testing.assert_allclose(np.asarray(gc[k]), np.asarray(gd[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=k)


def test_cells_two_head_grads_match_dense(cells_env):
    mix, spec = _mix3(seed=11, n=300)
    r = np.random.RandomState(12)
    x = _sorted_queries(r, 64, 0.0, 1.0)
    ref = jnp.asarray(r.randn(64, 3), jnp.float32)

    def head1(val, jac):
        from gaussian_fluids_tpu.solver import losses
        return losses.vorticity_loss_3d(jac, ref) + jnp.mean(val ** 2)

    def head2(val, jac):
        from gaussian_fluids_tpu.solver import losses
        return losses.divergence_loss(jac)

    (l1c, l2c), (g1c, g2c) = field.two_head_grads(
        mix.params(), mix.alive, spec, x, head1, head2)

    def heads(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], mix.alive)
        val, jac = field.value_and_jac_dense(m, spec, x)
        return head1(val, jac), head2(val, jac)

    (l1d, l2d), vjp = jax.vjp(heads, mix.params())
    g1d = vjp((jnp.ones(()), jnp.zeros(())))[0]
    g2d = vjp((jnp.zeros(()), jnp.ones(())))[0]
    np.testing.assert_allclose(float(l1c), float(l1d), rtol=1e-5)
    np.testing.assert_allclose(float(l2c), float(l2d), rtol=1e-5)
    for k in g1c:
        np.testing.assert_allclose(np.asarray(g1c[k]), np.asarray(g1d[k]),
                                   rtol=1e-3, atol=5e-3, err_msg=k)
        np.testing.assert_allclose(np.asarray(g2c[k]), np.asarray(g2d[k]),
                                   rtol=1e-3, atol=5e-3, err_msg=k)


def test_morton_spatially_sorted_is_invariant():
    """Reordering the mixture must not change the field (order-invariant
    sums) and must put dead rows last."""
    mix, spec = _mix3(seed=13)
    r = np.random.RandomState(14)
    x = jnp.asarray(r.uniform(0, 1, (64, 3)).astype(np.float32))
    v0 = field.value_and_jac_dense(mix, spec, x)[0]
    ms = mix.spatially_sorted()
    v1 = field.value_and_jac_dense(ms, spec, x)[0]
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-5,
                               atol=1e-6)
    alive = np.asarray(ms.alive)
    assert not alive[np.argmin(alive):].any()


def test_coarsen_mask_is_conservative():
    """OR-pooling: a coarse pair is live iff any of its fine pairs is —
    the exactness condition for the SMEM-safe fallback tiling."""
    r = np.random.RandomState(21)
    fine = jnp.asarray(r.rand(32, 24) < 0.15)
    coarse = field._coarsen_mask(fine, 8, 4)
    assert coarse.shape == (4, 6)
    f = np.asarray(fine).reshape(4, 8, 6, 4)
    np.testing.assert_array_equal(np.asarray(coarse).astype(bool),
                                  f.any(axis=(1, 3)))


def test_cells_value_jac_coarse_default_tiles(cells_env, monkeypatch):
    """The production default tiling (256x512): queries pad to the coarse
    block, the mixture's 512-bucket capacity divides the fallback tile,
    and results still match the dense oracle on a non-multiple batch."""
    monkeypatch.setenv("GF_CELLS_TB", "256")
    monkeypatch.setenv("GF_CELLS_TN", "512")
    mix, spec = _mix3(seed=31, n=700)
    r = np.random.RandomState(32)
    x = _sorted_queries(r, 300)     # 300 % 256 != 0
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vc, jc = field.value_and_jac(mix, spec, x, presorted=True,
                                 need_dx=False)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vd), rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jd), rtol=1e-3,
                               atol=2e-3)


def test_cells_full_projection_epoch_runs(cells_env, monkeypatch):
    """The production seam: a full 3D projection (hoisted targets +
    two-head cells kernels + boundary value head through the cells VJP +
    PCGrad + Adam) must trace and run with the cells backend forced, and
    keep the field finite."""
    monkeypatch.setenv("GF_CELLS_CAP", "0.9")
    from gaussian_fluids_tpu.solver.project import project_3d
    mix, spec = _mix3(seed=41, n=400)
    r = np.random.RandomState(42)
    g = np.linspace(0.1, 0.9, 4, dtype=np.float32)
    test_x = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    out = project_3d(mix, spec, mix, 0.01, domain=(0, 1, 0, 1, 0, 1),
                     test_x=test_x, key=jax.random.PRNGKey(7),
                     scene_name="ring_collide", batch_size=64,
                     max_epoch=4, check_iter=2, verbose=0)
    new_mix = out[0] if isinstance(out, tuple) else out
    assert bool(jnp.all(jnp.isfinite(new_mix.positions)))
    assert bool(jnp.all(jnp.isfinite(new_mix.values)))
