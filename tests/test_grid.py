"""Culled (uniform-grid) backend must match the dense backend exactly
(SURVEY.md §4 dense-vs-fast differential testing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field, grid


def _mix(n, d, seed, pad=True):
    rng = np.random.RandomState(seed)
    lo = (-5,) * d
    hi = (5,) * d
    spec = FieldSpec.create(lo, hi, n, d=d, vdim=d)
    mix = GaussianMixture.create(rng.uniform(-4.5, 4.5, (n, d)), spec,
                                 pad=pad)
    sca = mix.scalings + jnp.asarray(
        rng.uniform(-0.4, 0.4, mix.scalings.shape), jnp.float32)
    rot = mix.rotations + jnp.asarray(
        rng.uniform(-1, 1, mix.rotations.shape), jnp.float32)
    val = jnp.asarray(rng.randn(*mix.values.shape) *
                      np.asarray(mix.alive)[:, None], jnp.float32)
    return GaussianMixture(mix.positions, sca, rot, val, mix.alive), spec


@pytest.mark.parametrize("d", [2, 3])
def test_culled_matches_dense(d):
    mix, spec = _mix(200, d, seed=d)
    cap = grid.suggest_capacity(mix, spec)
    g = grid.build_grid(mix, spec, cap)
    assert int(g.overflow) == 0
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.uniform(-5.5, 5.5, (64, d)), jnp.float32)
    v_d, j_d = field.value_and_jac(mix, spec, x)
    v_c, j_c = grid.value_and_jac_culled(mix, spec, x, g)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


def test_culled_gradients_match_dense():
    mix, spec = _mix(80, 2, seed=5)
    cap = grid.suggest_capacity(mix, spec)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-4, 4, (32, 2)), jnp.float32)

    def loss_dense(p):
        m = mix.with_params(p)
        v, j = field.value_and_jac(m, spec, x)
        return jnp.abs(v).mean() + jnp.abs(j).mean()

    def loss_culled(p):
        m = mix.with_params(p)
        g = grid.build_grid(m, spec, cap)
        v, j = grid.value_and_jac_culled(m, spec, x, g)
        return jnp.abs(v).mean() + jnp.abs(j).mean()

    gd = jax.grad(loss_dense)(mix.params())
    gc = jax.grad(loss_culled)(mix.params())
    for k in gd:
        np.testing.assert_allclose(np.asarray(gc[k]), np.asarray(gd[k]),
                                   rtol=5e-3, atol=1e-5, err_msg=k)


def test_overflow_reported():
    # capacity 1 with clustered gaussians must overflow, not crash
    rng = np.random.RandomState(0)
    spec = FieldSpec.create((-5, -5), (5, 5), 50, d=2, vdim=2)
    mix = GaussianMixture.create(
        rng.uniform(-0.1, 0.1, (50, 2)), spec, pad=False)
    g = grid.build_grid(mix, spec, capacity=1)
    assert int(g.overflow) > 0


def test_capacity_suggestion_power_of_two():
    mix, spec = _mix(100, 2, seed=1)
    cap = grid.suggest_capacity(mix, spec)
    assert cap & (cap - 1) == 0 and cap >= 8
