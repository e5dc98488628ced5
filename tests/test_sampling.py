"""Gaussian-importance collocation samplers (reference
3D/advance.py:343-363 — defined-but-unused parity components)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.solver.sampling import (generate_all_gaussians,
                                                 generate_gaussians)

DOM2 = (-1.0, 1.0, -1.0, 1.0)
DOM3 = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)


def _mix(positions, d, scalings=None, rotations=None):
    pos = np.asarray(positions, np.float32)
    spec = FieldSpec.create((-1.0,) * d, (1.0,) * d, pos.shape[0], d=d,
                            vdim=d)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    if scalings is not None:
        p["scalings"] = jnp.asarray(np.asarray(scalings, np.float32))
    if rotations is not None:
        p["rotations"] = jnp.asarray(np.asarray(rotations, np.float32))
    return mix.with_params(p), spec


@pytest.mark.parametrize("d", [2, 3])
def test_samples_cluster_around_picked_gaussian(d):
    # one very tight Gaussian (scaling = -log(scale), big s => tiny scale)
    dom = DOM2 if d == 2 else DOM3
    mix, spec = _mix([[0.5] * d], d, scalings=[[6.0] * d])
    x = generate_gaussians(jax.random.PRNGKey(0), mix, spec, dom, 256)
    assert x.shape == (256, d)
    np.testing.assert_allclose(np.asarray(x), 0.5, atol=0.05)


def test_restrict_excludes_gaussians():
    mix, spec = _mix([[-0.8, -0.8], [0.8, 0.8]], 2,
                     scalings=[[4.0, 4.0]] * 2)
    restrict = jnp.array([False, True] + [False] * (mix.capacity - 2))
    x = generate_gaussians(jax.random.PRNGKey(1), mix, spec, DOM2, 128,
                           restrict=restrict)
    assert np.all(np.asarray(x) > 0.5)  # only the second Gaussian's blob


def test_sample_covariance_matches_precision():
    # anisotropic, rotated 2D Gaussian: empirical covariance ~ P^{-1}
    theta = 0.7
    mix, spec = _mix([[0.0, 0.0]], 2, scalings=[[1.0, 2.5]],
                     rotations=[theta])
    x = np.asarray(generate_gaussians(jax.random.PRNGKey(2), mix, spec,
                                      (-9.0, 9.0, -9.0, 9.0), 40000))
    emp = np.cov(x.T)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    want = rot @ np.diag(np.exp([-2.0, -5.0])) @ rot.T
    np.testing.assert_allclose(emp, want, atol=2e-3)


def test_clamped_to_domain():
    mix, spec = _mix([[0.95, 0.95]], 2, scalings=[[-1.0, -1.0]])  # huge
    x = np.asarray(generate_gaussians(jax.random.PRNGKey(3), mix, spec,
                                      DOM2, 512))
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_generate_all_gaussians_shapes_and_padding():
    mix, spec = _mix([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]], 3,
                     scalings=[[5.0] * 3] * 2)
    x = np.asarray(generate_all_gaussians(jax.random.PRNGKey(4), mix, spec,
                                          DOM3))
    assert x.shape == (mix.capacity, 3)
    # alive rows sit on their Gaussians; padded rows are in-domain
    np.testing.assert_allclose(x[0], [-0.5, 0, 0], atol=0.1)
    np.testing.assert_allclose(x[1], [0.5, 0, 0], atol=0.1)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_no_eligible_gaussian_falls_back_to_uniform():
    # restrict excludes everything: categorical over all -inf logits would
    # pick index 0 (a tight Gaussian at 0.5); the fallback must return
    # uniform domain samples instead of that slot's blob
    mix, spec = _mix([[0.5, 0.5]], 2, scalings=[[6.0, 6.0]])
    restrict = jnp.zeros((mix.capacity,), bool)
    x = np.asarray(generate_gaussians(jax.random.PRNGKey(5), mix, spec,
                                      DOM2, 512, restrict=restrict))
    assert x.min() >= -1.0 and x.max() <= 1.0
    # uniform spread, not clustered at (0.5, 0.5)
    assert x.std(0).min() > 0.3
    assert abs(x.mean()) < 0.2


def test_bad_domain_raises():
    mix, spec = _mix([[0.0, 0.0]], 2)
    with pytest.raises(ValueError):
        generate_gaussians(jax.random.PRNGKey(0), mix, spec, DOM3, 8)
