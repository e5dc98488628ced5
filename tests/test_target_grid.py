"""Cached covector-target mode for the projections (opt-in
``target_grid_res``): the exact RK4 targets are evaluated once on a grid
and interpolated per epoch."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.solver import covector
from gaussian_fluids_tpu.solver.project import (ProjectWeights, _runner_2d,
                                                _runner_3d, project_2d,
                                                project_3d)

DOMAIN = (-2.0, 2.0, -2.0, 2.0, -2.0, 2.0)


def _smooth_mix(n_side=3):
    xs = np.linspace(-1.2, 1.2, n_side, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    spec = FieldSpec.create((-2.0,) * 3, (2.0,) * 3, pos.shape[0], d=3,
                            vdim=3)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    rng = np.random.RandomState(0)
    # wide, smooth Gaussians (scaling = -log scale; 0 -> unit scale)
    p["scalings"] = jnp.zeros_like(p["scalings"])
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def test_interpolated_targets_match_exact():
    mix, spec = _smooth_mix()
    dt = jnp.asarray(0.01, jnp.float32)
    runner = _runner_3d(spec, None, ProjectWeights(), 0.0, 64,
                        (-2.0,) * 3, (2.0,) * 3, (48, 48, 48))
    tgt = runner[3](mix.params(), mix.alive, dt)
    assert tgt.shape == (48, 48, 48, 4)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1.9, 1.9, (128, 3)).astype(np.float32))
    ev, eh = covector.advected_vorticity_3d(mix, spec, x, dt)
    from gaussian_fluids_tpu.ops.interp import trilinear_interp
    ref = jax.vmap(lambda f: trilinear_interp(f, x, DOMAIN),
                   in_axes=-1, out_axes=-1)(tgt)
    scale = float(jnp.abs(ev).max())
    np.testing.assert_allclose(np.asarray(ref[:, :3]), np.asarray(ev),
                               atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(ref[:, 3]), np.asarray(eh),
                               atol=0.02 * max(scale, float(
                                   jnp.abs(eh).max())))


def _smooth_mix_2d(scene, n_side=5):
    """Smooth mixture spanning the taylor_green scaled domain."""
    sf = scene.scaling_factor
    dom = scene.advance_domain
    lo = np.asarray([dom[0], dom[2]]) * sf
    hi = np.asarray([dom[1], dom[3]]) * sf
    xs = np.linspace(lo[0], hi[0], n_side, dtype=np.float32)
    ys = np.linspace(lo[1], hi[1], n_side, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    spec = FieldSpec.create(tuple(lo), tuple(hi), pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    rng = np.random.RandomState(3)
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def test_interpolated_targets_match_exact_2d():
    from gaussian_fluids_tpu.ops.interp import bilinear_interp
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("taylor_green")
    sf = scene.scaling_factor
    mix, spec = _smooth_mix_2d(scene)
    dt = jnp.asarray(0.001, jnp.float32)
    adv = jnp.asarray(scene.advance_domain_at(0, 0.001), jnp.float32)
    runner = _runner_2d(spec, "taylor_green", ProjectWeights(), 0.0, 64,
                        (96, 96))
    tgt = runner[3](mix.params(), mix.alive, adv, dt)
    assert tgt.shape == (96, 96)

    lo = np.asarray([adv[0], adv[2]], np.float32) * sf
    hi = np.asarray([adv[1], adv[3]], np.float32) * sf
    rng = np.random.RandomState(4)
    margin = 0.05 * (hi - lo)
    x = jnp.asarray(rng.uniform(lo + margin, hi - margin,
                                (128, 2)).astype(np.float32))
    exact = covector.advected_vorticity_2d(mix, spec, x, dt,
                                           jnp.asarray(lo), jnp.asarray(hi))
    interp = bilinear_interp(tgt, x, (lo[0], hi[0], lo[1], hi[1]))
    scale = float(jnp.abs(exact).max())
    np.testing.assert_allclose(np.asarray(interp), np.asarray(exact),
                               atol=0.02 * scale)


def test_project2d_cached_target_runs():
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("taylor_green")
    mix, spec = _smooth_mix_2d(scene)
    adv = scene.advance_domain_at(0, 0.001)
    sf = scene.scaling_factor
    xs = np.linspace(adv[0] * sf, adv[1] * sf, 8, dtype=np.float32)
    ys = np.linspace(adv[2] * sf, adv[3] * sf, 8, dtype=np.float32)
    test_x = jnp.asarray(
        np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2))
    out = project_2d(mix, spec, mix, 0.001, scene=scene, adv_domain=adv,
                     test_x=test_x, key=jax.random.PRNGKey(0),
                     batch_size=64, max_epoch=100, check_iter=50,
                     verbose=0, target_grid_res=32)
    assert isinstance(out, GaussianMixture)
    assert np.isfinite(np.asarray(out.params()["values"])).all()


def test_clone_cached_target_matches_exact_2d():
    """The clone's cached [val, jac] grid reproduces the exact old field."""
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.ops.interp import bilinear_interp
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.clone import _clone_runner

    scene = get_scene_2d("taylor_green")
    mix, spec = _smooth_mix_2d(scene)
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    runner = _clone_runner(spec, 64, (96, 96))
    tgt = runner[3](mix.params(), mix.alive, lo, hi)
    assert tgt.shape == (96, 96, 6)

    rng = np.random.RandomState(5)
    margin = 0.05 * (np.asarray(hi) - np.asarray(lo))
    x = jnp.asarray(rng.uniform(np.asarray(lo) + margin,
                                np.asarray(hi) - margin,
                                (128, 2)).astype(np.float32))
    ev, ej = field.value_and_jac(mix, spec, x)
    dom = (lo[0], hi[0], lo[1], hi[1])
    ref = jax.vmap(lambda ch: bilinear_interp(ch, x, dom),
                   in_axes=-1, out_axes=-1)(tgt)
    scale = max(float(jnp.abs(ev).max()), float(jnp.abs(ej).max()))
    np.testing.assert_allclose(np.asarray(ref[:, :2]), np.asarray(ev),
                               atol=0.02 * scale)
    np.testing.assert_allclose(
        np.asarray(ref[:, 2:]).reshape(-1, 2, 2), np.asarray(ej),
        atol=0.05 * scale)


def test_clone_cached_target_matches_exact_3d():
    """The d=3 branch: trilinear over 12 [val, jac] channels."""
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.ops.interp import multi_channel_interp
    from gaussian_fluids_tpu.solver.clone import _clone_runner

    mix, spec = _smooth_mix()
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    runner = _clone_runner(spec, 64, (32, 32, 32))
    tgt = runner[3](mix.params(), mix.alive, lo, hi)
    assert tgt.shape == (32, 32, 32, 12)

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.uniform(-1.9, 1.9, (128, 3)).astype(np.float32))
    ev, ej = field.value_and_jac(mix, spec, x)
    # the grid spans the PADDED domain (spec.lo/hi, which FieldSpec.create
    # widens past the user domain) — interpolate over the same box
    dom = (lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])
    ref = multi_channel_interp(tgt, x, dom)
    scale = max(float(jnp.abs(ev).max()), float(jnp.abs(ej).max()))
    np.testing.assert_allclose(np.asarray(ref[:, :3]), np.asarray(ev),
                               atol=0.03 * scale)
    np.testing.assert_allclose(
        np.asarray(ref[:, 3:]).reshape(-1, 3, 3), np.asarray(ej),
        atol=0.08 * scale)


def test_clone_cached_target_runs():
    """End-to-end clone (with a forced split) under target_grid_res."""
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.clone import clone_velocity_field

    scene = get_scene_2d("taylor_green")
    mix, spec = _smooth_mix_2d(scene)
    p = mix.params()
    # force one anisotropic Gaussian so the split + re-fit path runs
    p["scalings"] = p["scalings"].at[0, 0].add(np.log(2.0))
    mix = mix.with_params(p)
    lo, hi = spec.lo, spec.hi
    xs = np.linspace(lo[0], hi[0], 8, dtype=np.float32)
    ys = np.linspace(lo[1], hi[1], 8, dtype=np.float32)
    test_x = jnp.asarray(
        np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2))
    out = clone_velocity_field(mix, spec, lo=lo, hi=hi, test_x=test_x,
                               key=jax.random.PRNGKey(0), d=2,
                               batch_size=64, max_epoch=100, check_iter=50,
                               verbose=0, target_grid_res=32)
    assert isinstance(out, GaussianMixture)
    assert out.n_alive() > mix.n_alive()
    assert np.isfinite(np.asarray(out.params()["values"])).all()


def test_project3d_cached_target_runs_and_converges():
    mix, spec = _smooth_mix()
    xs = np.linspace(-1.9, 1.9, 6, dtype=np.float32)
    test_x = jnp.asarray(
        np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3))
    out = project_3d(mix, spec, mix, 0.01, domain=DOMAIN, test_x=test_x,
                     key=jax.random.PRNGKey(0), batch_size=128,
                     max_epoch=100, check_iter=50, verbose=0,
                     target_grid_res=16)
    assert isinstance(out, GaussianMixture)
    assert np.isfinite(np.asarray(out.params()["values"])).all()
