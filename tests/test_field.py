"""Core field math: value / Jacobian vs closed forms and jax.jacfwd.

Test strategy per SURVEY.md §4: analytic oracles (single hand-placed
Gaussian) + dense-vs-fast differential testing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops.rotations import (rotation_matrix_2d,
                                               rotation_matrix_3d)


def _mix2d(n=5, seed=0, pad=False):
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, 2)), spec, pad=pad)
    mix = GaussianMixture(
        positions=mix.positions,
        scalings=mix.scalings + jnp.asarray(
            rng.uniform(-0.3, 0.3, mix.scalings.shape), jnp.float32),
        rotations=mix.rotations + jnp.asarray(
            rng.uniform(-1, 1, mix.rotations.shape), jnp.float32),
        values=jnp.asarray(rng.randn(*mix.values.shape), jnp.float32),
        alive=mix.alive,
    )
    return mix, spec


def _mix3d(n=4, seed=1, pad=False):
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mix = GaussianMixture.create(rng.uniform(0.2, 0.8, (n, 3)), spec, pad=pad)
    mix = GaussianMixture(
        positions=mix.positions,
        scalings=mix.scalings + jnp.asarray(
            rng.uniform(-0.3, 0.3, mix.scalings.shape), jnp.float32),
        rotations=jnp.asarray(rng.randn(*mix.rotations.shape), jnp.float32),
        values=jnp.asarray(rng.randn(*mix.values.shape), jnp.float32),
        alive=mix.alive,
    )
    return mix, spec


def test_rotation_2d_orthonormal():
    ang = jnp.asarray([0.3, -1.2, 2.0])
    R = rotation_matrix_2d(ang)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)),
        np.broadcast_to(np.eye(2), (3, 2, 2)), atol=1e-6)


def test_rotation_3d_orthonormal_and_identity():
    q = jnp.asarray([[1., 0, 0, 0], [0.5, 0.5, -0.5, 0.5], [2., 1., 0., -1.]])
    R = rotation_matrix_3d(q)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)),
        np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_single_gaussian_closed_form_2d():
    spec = FieldSpec.create((-5, -5), (5, 5), 1, d=2, vdim=2)
    mu = jnp.asarray([[0.5, -0.25]])
    s = jnp.asarray([[0.2, -0.1]])
    theta = jnp.asarray([0.7])
    v = jnp.asarray([[1.5, -2.0]])
    mix = GaussianMixture(mu, s, theta, v, jnp.ones((1,), bool))
    x = jnp.asarray([[0.9, 0.1]])
    # closed form
    R = np.array([[np.cos(0.7), -np.sin(0.7)], [np.sin(0.7), np.cos(0.7)]])
    P = R @ np.diag(np.exp(2 * np.asarray(s[0]))) @ R.T
    delta = np.asarray(x[0] - mu[0])
    g = np.exp(-0.5 * delta @ P @ delta)
    expect_val = np.asarray(v[0]) * (g - spec.clamp_threshold)
    expect_jac = np.outer(np.asarray(v[0]), -g * (P @ delta))
    val, jac = field.value_and_jac(mix, spec, x)
    np.testing.assert_allclose(np.asarray(val[0]), expect_val, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jac[0]), expect_jac, rtol=1e-4,
                               atol=1e-6)


@pytest.mark.parametrize("dim", [2, 3])
def test_jacobian_matches_jacfwd(dim):
    mix, spec = (_mix2d() if dim == 2 else _mix3d())
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-2, 2, (8, dim)) if dim == 2
                    else rng.uniform(0.2, 0.8, (8, 3)), jnp.float32)
    val, jac = field.value_and_jac(mix, spec, x)
    jac_ad = jax.vmap(jax.jacfwd(
        lambda p: field.value(mix, spec, p[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(val),
                               np.asarray(field.value(mix, spec, x)),
                               rtol=1e-6)


def test_padding_is_inert():
    mix_np, spec = _mix2d(n=5, pad=False)
    mix_p = GaussianMixture.from_arrays(
        mix_np.positions, mix_np.scalings, mix_np.rotations, mix_np.values,
        spec, pad=True)
    # garbage in the padded tail must not contribute
    mix_p = GaussianMixture(
        mix_p.positions, mix_p.scalings, mix_p.rotations,
        mix_p.values.at[5:].set(3.21), mix_p.alive)
    assert mix_p.capacity == 512
    x = jnp.asarray(np.random.RandomState(3).uniform(-2, 2, (16, 2)),
                    jnp.float32)
    v1, j1 = field.value_and_jac(mix_np, spec, x)
    v2, j2 = field.value_and_jac(mix_p, spec, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)


def test_out_of_domain_gaussian_excluded():
    mix, spec = _mix2d(n=3, pad=False)
    # Move one Gaussian far outside the padded domain: it must stop counting.
    pos = mix.positions.at[0].set(jnp.asarray([100.0, 100.0]))
    mix_out = GaussianMixture(pos, mix.scalings, mix.rotations, mix.values,
                              mix.alive)
    mix_rest = GaussianMixture(
        mix.positions[1:], mix.scalings[1:], mix.rotations[1:],
        mix.values[1:], mix.alive[1:])
    x = jnp.asarray([[0.0, 0.0], [1.0, 1.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(field.value(mix_out, spec, x)),
        np.asarray(field.value(mix_rest, spec, x)), atol=1e-6)


def test_clamp_compact_support():
    spec = FieldSpec.create((-5, -5), (5, 5), 1, d=2, vdim=1,
                            clamp_threshold=1e-2)
    mix = GaussianMixture(
        jnp.zeros((1, 2)), jnp.zeros((1, 2)), jnp.zeros((1,)),
        jnp.ones((1, 1)), jnp.ones((1,), bool))
    # support radius = sqrt(-2 ln c); beyond it value and jac are exactly 0
    r = float(np.sqrt(-2 * np.log(1e-2)))
    x = jnp.asarray([[r + 0.01, 0.0], [r - 0.05, 0.0]], jnp.float32)
    val, jac = field.value_and_jac(mix, spec, x)
    assert float(val[0, 0]) == 0.0 and float(np.abs(jac[0]).sum()) == 0.0
    assert float(val[1, 0]) > 0.0


def test_chunked_matches_direct():
    mix, spec = _mix2d(n=6)
    x = jnp.asarray(np.random.RandomState(5).uniform(-3, 3, (37, 2)),
                    jnp.float32)
    v1, j1 = field.value_and_jac(mix, spec, x)
    v2, j2 = field.value_and_jac_chunked(mix, spec, x, chunk=8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)


def test_dense_oracle_close_when_clamp_tiny():
    mix, spec = _mix2d(n=5)
    spec_tiny = spec.replace(clamp_threshold=1e-12)
    x = jnp.asarray(np.random.RandomState(9).uniform(-2, 2, (10, 2)),
                    jnp.float32)
    fast = field.value(mix, spec_tiny, x)
    oracle = field.value_dense_oracle(mix, spec_tiny, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(oracle),
                               rtol=1e-4, atol=1e-5)


def test_packed_precision_entries_match_matrix():
    """Closed-form packed entries == slicing the einsum precision matrix
    (the kernel packing: diagonal first, then (i<j) off-diagonals)."""
    from gaussian_fluids_tpu.ops import rotations as rot
    rng = np.random.RandomState(11)
    for d in (2, 3):
        n = 64
        scal = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
        rots = (jnp.asarray(rng.uniform(-3, 3, (n,)), jnp.float32) if d == 2
                else jnp.asarray(rng.uniform(-1, 1, (n, 4)), jnp.float32))
        P = rot.precision_matrix(scal, rots, d)
        pk = rot.packed_precision_entries(scal, rots, d)
        cols = [P[:, i, i] for i in range(d)]
        cols += [P[:, i, j] for i in range(d) for j in range(i + 1, d)]
        ref = jnp.stack(cols, axis=-1)
        np.testing.assert_allclose(np.asarray(pk), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"d={d}")
