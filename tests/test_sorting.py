"""Invariants of the spatial sorting used by the block-sparse backend."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver.clone import (split_gaussians_2d,
                                              split_gaussians_3d)


def _mix(n, d, seed):
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-5,) * d, (5,) * d, n, d=d, vdim=d)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, d)), spec)
    val = jnp.asarray(rng.randn(*mix.values.shape) *
                      np.asarray(mix.alive)[:, None], jnp.float32)
    return GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                           val, mix.alive), spec


def test_spatially_sorted_preserves_field():
    mix, spec = _mix(90, 2, seed=5)
    x = jnp.asarray(np.random.RandomState(1).uniform(-4, 4, (40, 2)),
                    jnp.float32)
    v1, j1 = field.value_and_jac_dense(mix, spec, x)
    ms = mix.spatially_sorted()
    v2, j2 = field.value_and_jac_dense(ms, spec, x)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(j1), rtol=1e-5,
                               atol=1e-6)
    # ascending in coordinate 0 over alive rows; dead rows last
    alive = np.asarray(ms.alive)
    x0 = np.asarray(ms.positions)[:, 0]
    n_alive = alive.sum()
    assert alive[:n_alive].all() and not alive[n_alive:].any()
    assert (np.diff(x0[:n_alive]) >= 0).all()


def test_split_keeps_stop_mask_aligned():
    rng = np.random.RandomState(7)
    for d, split in ((2, split_gaussians_2d), (3, split_gaussians_3d)):
        mix, spec = _mix(60, d, seed=d)
        # widen some gaussians so splitting triggers
        sca = np.array(mix.scalings)
        sca[5:15, 0] += 1.5
        mix = GaussianMixture(mix.positions, jnp.asarray(sca),
                              mix.rotations, mix.values, mix.alive)
        new_mix, stop, n_split = split(mix, spec, rng)
        assert n_split > 0
        n = int(new_mix.n_alive())
        assert stop.shape[0] == n
        # frozen rows must be the unsplit originals: their (position, value)
        # pairs all exist in the original mixture
        pos_new = np.asarray(new_mix.positions)[:n][stop]
        pos_old = np.asarray(mix.positions)[np.asarray(mix.alive)]
        dists = np.abs(pos_new[:, None, :] - pos_old[None, :, :]).sum(-1)
        assert (dists.min(axis=1) < 1e-6).all()
        # alive rows sorted by the canonical spatial key (coordinate 0 in
        # 2D, Morton in 3D — ops/spatial.py)
        from gaussian_fluids_tpu.ops import spatial
        key = spatial.sort_key_np(np.asarray(new_mix.positions)[:n])
        assert (np.diff(key) >= 0).all()
