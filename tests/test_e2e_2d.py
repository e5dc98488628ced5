"""Minimum end-to-end slice (SURVEY.md §7 build step 3): initialize +
advance on Taylor-Green 2D with tiny budgets, plus checkpoint round-trip
in the reference's .pt format."""

import os

import numpy as np
import pytest
import torch

from gaussian_fluids_tpu.io import checkpoint
from gaussian_fluids_tpu.solver.simulate2d import advance_2d, initialize_2d


@pytest.fixture(scope="module")
def tg_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tg"))
    initialize_2d("taylor_green", out, max_epoch=200, viz=False,
                  particle_count=(10, 10), verbose=0)
    return out


def test_initialize_writes_reference_format(tg_run):
    path = os.path.join(tg_run, "gaussian_velocity_0.pt")
    assert os.path.exists(path)
    data = torch.load(path, map_location="cpu", weights_only=False)
    # exact reference checkpoint keys (reference 2D/GSR.py:231-240)
    assert set(data) == {"positions", "scalings", "rotations", "values",
                         "clamp_threshold", "min_grid_scale", "domain_range"}
    assert data["positions"].shape == (100, 2)
    assert data["values"].shape == (100, 2)
    assert data["rotations"].shape == (100,)
    assert len(data["domain_range"]) == 4
    assert data["clamp_threshold"] == 1e-3


def test_checkpoint_roundtrip(tg_run):
    path = os.path.join(tg_run, "gaussian_velocity_0.pt")
    mix, spec = checkpoint.load_checkpoint(path)
    assert int(mix.n_alive()) == 100
    p2 = os.path.join(tg_run, "roundtrip.pt")
    checkpoint.save_checkpoint(p2, mix, spec)
    mix2, spec2 = checkpoint.load_checkpoint(p2)
    assert spec2 == spec
    np.testing.assert_allclose(np.asarray(mix2.compact().positions),
                               np.asarray(mix.compact().positions))


def test_advance_two_frames(tg_run):
    advance_2d("taylor_green", tg_run, dt=.001, last_time=.002,
               max_epoch=100, viz=False, verbose=0, test_res=(30, 30))
    for n in (1, 2):
        assert os.path.exists(
            os.path.join(tg_run, f"gaussian_velocity_{n}.pt"))
    # field should still roughly resemble taylor-green after 2 tiny steps
    mix, spec = checkpoint.load_checkpoint(
        os.path.join(tg_run, "gaussian_velocity_2.pt"))
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.scenes import get_scene_2d
    import jax.numpy as jnp
    scene = get_scene_2d("taylor_green")
    sf = scene.scaling_factor
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0.5, 5.5, (64, 2)), jnp.float32)
    v, _ = field.value_and_jac(mix, spec, x * sf)
    ref = scene.target_velocity(x * sf)
    err = float(jnp.abs(v - ref).mean())
    scale = float(jnp.abs(ref).mean())
    assert err < scale, (err, scale)


def test_rk1_backtrace_covector_scheme():
    """The reference's alternative 'rk1-backtrace' scheme
    (2D/advance.py:34-44, unused by default) must agree with RK4 to first
    order for small dt."""
    import jax.numpy as jnp
    from gaussian_fluids_tpu import FieldSpec, GaussianMixture
    from gaussian_fluids_tpu.solver import covector

    rng = np.random.RandomState(11)
    spec = FieldSpec.create((-5, -5), (5, 5), 80, d=2, vdim=2)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (80, 2)), spec)
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          jnp.asarray(rng.randn(*mix.values.shape) * 0.3
                                      * np.asarray(mix.alive)[:, None],
                                      jnp.float32), mix.alive)
    x = jnp.asarray(rng.uniform(-3, 3, (64, 2)), jnp.float32)
    lo, hi = jnp.asarray([-5., -5.]), jnp.asarray([5., 5.])
    dt = 1e-3
    v4 = covector.advected_vorticity_2d(mix, spec, x, dt, lo, hi)
    v1 = covector.advected_vorticity_2d_rk1(mix, spec, x, dt, lo, hi)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v4), atol=1e-3)
