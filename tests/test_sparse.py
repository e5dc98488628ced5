"""Sparse cell-list backend must match the dense masked sweep exactly
(same mask, same per-pair math; reduction order may differ by float
rounding only) — values, Jacobians, and two-head gradients — and must
fall back to dense under its guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field, sparse


def _mix3(n=300, seed=0, spread=0.25, pad=True):
    r = np.random.RandomState(seed)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mix = GaussianMixture.create(r.uniform(0.05, 0.95, (n, 3)), spec,
                                 pad=pad)
    p = mix.params()
    # tighten so the support radius fits a 1/16 cell
    base = -np.log(spread * np.asarray(
        field.support_radius(p["scalings"], spec.clamp_threshold))[:, None]
        / np.sqrt(-2 * np.log(spec.clamp_threshold)))
    p["scalings"] = jnp.asarray(
        np.asarray(p["scalings"]) + base
        + 0.1 * r.randn(*p["scalings"].shape).astype(np.float32))
    p["rotations"] = jnp.asarray(r.randn(*p["rotations"].shape)
                                 .astype(np.float32))
    p["values"] = jnp.asarray(r.randn(*p["values"].shape)
                              .astype(np.float32))
    return mix.with_params(p), spec


def test_value_jac_matches_dense():
    mix, spec = _mix3()
    r = np.random.RandomState(1)
    # queries inside, near the boundary, and up to one cell outside
    x = jnp.asarray(np.concatenate([
        r.uniform(0, 1, (256, 3)),
        r.uniform(-0.05, 0.0, (32, 3)) + [[0, 0.5, 0.5]],
        r.uniform(1.0, 1.05, (32, 3)) * [[1, 0, 0]] + [[0, 0.5, 0.5]],
    ]).astype(np.float32))
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vs, js = sparse.value_and_jac_sparse(mix, spec, x)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(js), np.asarray(jd), rtol=2e-5,
                               atol=1e-5)
    # the sparse branch (not the fallback) must actually have run
    L = sparse.pair_capacity(x.shape[0], mix.capacity, spec)
    _, _, used = sparse._sparse_value_jac(mix.params(), mix.alive, spec, x,
                                          L, True)
    assert bool(used)


def test_value_only_matches_dense():
    mix, spec = _mix3(seed=3)
    r = np.random.RandomState(2)
    x = jnp.asarray(r.uniform(0, 1, (128, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sparse.value_sparse(mix, spec, x)),
        np.asarray(field.value_dense(mix, spec, x)), rtol=2e-5, atol=1e-6)


def test_oversize_gaussian_falls_back_dense():
    mix, spec = _mix3(seed=4)
    p = mix.params()
    s = np.array(p["scalings"], copy=True)
    s[7] = -1.5   # huge support radius >> one cell
    p["scalings"] = jnp.asarray(s)
    mix = mix.with_params(p)
    r = np.random.RandomState(5)
    x = jnp.asarray(r.uniform(0, 1, (64, 3)).astype(np.float32))
    L = sparse.pair_capacity(x.shape[0], mix.capacity, spec)
    vs, js, used = sparse._sparse_value_jac(mix.params(), mix.alive, spec,
                                            x, L, True)
    assert not bool(used)  # guard tripped
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(js), np.asarray(jd), rtol=1e-4,
                               atol=1e-5)


def test_capacity_overflow_falls_back_dense(monkeypatch):
    mix, spec = _mix3(seed=6)
    r = np.random.RandomState(7)
    x = jnp.asarray(r.uniform(0, 1, (128, 3)).astype(np.float32))
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vs, js, used = sparse._sparse_value_jac(mix.params(), mix.alive, spec,
                                            x, 8, True)   # absurdly small L
    assert not bool(used)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=1e-6)


def test_two_head_grads_match_dense():
    from gaussian_fluids_tpu.solver import losses
    mix, spec = _mix3(seed=8)
    r = np.random.RandomState(9)
    x = jnp.asarray(np.sort(r.uniform(0, 1, (256, 3)).astype(np.float32),
                            axis=0))
    ref_vor = jnp.asarray(r.randn(256, 3).astype(np.float32))
    ref_hel = jnp.asarray(r.randn(256).astype(np.float32))

    def head_vorhel(val, jac):
        return (losses.vorticity_loss_3d(jac, ref_vor)
                + losses.helicity_loss(val, jac, ref_hel))

    def head_div(val, jac):
        return losses.divergence_loss(jac)

    params, alive = mix.params(), mix.alive
    (l1d, l2d), (g1d, g2d) = field.two_head_grads(
        params, alive, spec, x, head_vorhel, head_div)
    (l1s, l2s), (g1s, g2s) = sparse.two_head_grads_sparse(
        params, alive, spec, x, head_vorhel, head_div)
    np.testing.assert_allclose(float(l1s), float(l1d), rtol=2e-5)
    np.testing.assert_allclose(float(l2s), float(l2d), rtol=2e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(g1s[k]), np.asarray(g1d[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(g2s[k]), np.asarray(g2d[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)


def test_dead_and_out_of_domain_excluded():
    mix, spec = _mix3(seed=10, pad=True)   # padded -> dead tail rows exist
    p = mix.params()
    pos = np.array(p["positions"], copy=True)
    pos[3] = [1.7, 0.5, 0.5]               # out of domain
    p["positions"] = jnp.asarray(pos)
    mix = mix.with_params(p)
    r = np.random.RandomState(11)
    x = jnp.asarray(r.uniform(0, 1, (64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sparse.value_and_jac_sparse(mix, spec, x)[0]),
        np.asarray(field.value_and_jac_dense(mix, spec, x)[0]),
        rtol=2e-5, atol=1e-6)


def test_value_jac_matches_dense_2d():
    """The backend is d-generic; 2D parity (9-cell neighborhoods, angle
    rotations, packed 3-entry precisions)."""
    n = 400
    r = np.random.RandomState(20)
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    mix = GaussianMixture.create(r.uniform(-4.5, 4.5, (n, 2)), spec)
    p = mix.params()
    p["scalings"] = p["scalings"] + 1.0
    p["rotations"] = jnp.asarray(r.uniform(-2, 2, (mix.capacity,))
                                 .astype(np.float32))
    p["values"] = jnp.asarray(r.randn(mix.capacity, 2).astype(np.float32))
    mix = mix.with_params(p)
    x = jnp.asarray(r.uniform(-5.2, 5.2, (256, 2)).astype(np.float32))
    vd, jd = field.value_and_jac_dense(mix, spec, x)
    vs, js = sparse.value_and_jac_sparse(mix, spec, x)
    # wide-overlap mixture: sums of ~100s of pairs differ by reduction
    # order only (segment_sum vs HIGHEST matmul)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=1e-4,
                               atol=3e-4)
    # the dense path's jac finish amplifies rounding ~50x on
    # near-cancelling components (docs/KERNELS.md); the sparse per-pair
    # form has no such amplification, so the dense side owns this slack
    np.testing.assert_allclose(np.asarray(js), np.asarray(jd), rtol=1e-3,
                               atol=1e-3)
    L = sparse.pair_capacity(x.shape[0], mix.capacity, spec)
    assert bool(sparse._sparse_value_jac(mix.params(), mix.alive, spec, x,
                                         L, True)[2])


def test_chunked_queries_match_unchunked(monkeypatch):
    """Public entry points stream large query sets through fixed chunks
    (solver hoisted-target sweeps batch ~25 epochs into one call; an
    unchunked pair list would be O(B*N/cells) — compile-time OOM at
    production scale). Chunking must not change values, and pad queries
    must not consume pair slots."""
    mix, spec = _mix3(seed=7)
    r = np.random.RandomState(4)
    x = jnp.asarray(r.uniform(-0.02, 1.02, (403, 3)).astype(np.float32))
    v1, j1 = sparse.value_and_jac_sparse(mix, spec, x)
    monkeypatch.setenv("GF_SPARSE_CHUNK", "64")  # 403 -> 7 chunks
    v2, j2 = sparse.value_and_jac_sparse(mix, spec, x)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=2e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(j1), rtol=2e-6,
                               atol=1e-6)
    # each chunk must still take the sparse branch (the pad points clip
    # into the empty pad ring; guards hold per chunk)
    L = sparse.pair_capacity(64, mix.capacity, spec)
    far = jnp.asarray(spec.lo, jnp.float32) - 1.0
    xc = jnp.broadcast_to(far, (64, 3)).at[:39].set(x[:39])
    assert bool(sparse._sparse_value_jac(mix.params(), mix.alive, spec,
                                         xc, L, True)[2])
    v3 = sparse.value_sparse(mix, spec, x)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v1), rtol=2e-6,
                               atol=1e-7)


def test_dead_rows_book_no_phantom_pairs(monkeypatch):
    """Pad/boundary queries clip into the pad ring; their out-of-grid
    neighbor offsets map to the dummy segment, whose count is the number
    of NOT-in_dom Gaussians (dead padding rows + out-of-domain alive
    rows). That segment must be zeroed before per-query counts are built,
    or a padded mixture (dead rows are routine after clone/kill
    re-padding) books 19 * dead_count phantom slots per pad query and
    silently drops whole chunks to the dense fallback (ADVICE r3)."""
    mix, spec = _mix3(seed=13, n=200, pad=True)
    # force a fat dead tail: pad capacity well beyond the alive count
    p = mix.params()
    cap = mix.capacity + 256
    pp = {k: jnp.zeros((cap,) + v.shape[1:], v.dtype).at[:mix.capacity]
          .set(v) for k, v in p.items()}
    # pad rotations with the identity quaternion: an all-zero quaternion
    # normalizes to NaN in the dense oracle's precisions
    pp["rotations"] = pp["rotations"].at[mix.capacity:, 0].set(1.0)
    alive = jnp.zeros((cap,), bool).at[:mix.capacity].set(mix.alive)
    mixp = GaussianMixture(pp["positions"], pp["scalings"],
                           pp["rotations"], pp["values"], alive)
    dead_count = int(cap - jnp.sum(alive))
    assert dead_count >= 256
    r = np.random.RandomState(14)
    # non-multiple-of-chunk query count -> the last chunk is mostly pad
    x = jnp.asarray(r.uniform(-0.02, 1.02, (71, 3)).astype(np.float32))
    monkeypatch.setenv("GF_SPARSE_CHUNK", "64")
    # tight capacity: with the phantom slots (19 * dead * pad_queries)
    # the guard would trip; without them the real pairs fit comfortably
    monkeypatch.setenv("GF_SPARSE_HEADROOM", "1.5")
    L = sparse.pair_capacity(64, cap, spec)
    assert L < 19 * dead_count * 57  # phantom load would overflow L
    far = jnp.asarray(spec.lo, jnp.float32) - 1.0
    xc = jnp.broadcast_to(far, (64, 3)).at[:7].set(x[64:])
    used = sparse._sparse_value_jac(mixp.params(), mixp.alive, spec, xc,
                                    L, True)[2]
    assert bool(used), "pad queries booked phantom dead-row pair slots"
    # and the streamed public path agrees with dense on the padded mixture
    vs, js = sparse.value_and_jac_sparse(mixp, spec, x)
    vd, jd = field.value_and_jac_dense(mixp, spec, x)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(js), np.asarray(jd), rtol=2e-5,
                               atol=1e-5)
