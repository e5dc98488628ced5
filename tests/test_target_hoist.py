"""Exact-target hoist (solver/project.py, solver/clone.py run_chunk):
in the Pallas regime the chunk's sample batches and their frozen-old-field
targets are computed in a few big batched sweeps before the scan instead
of per epoch inside it. That is a pure launch-amortization — same keys,
same sort, same kernels row-for-row — so the optimized parameters must be
IDENTICAL to the in-loop path (GF_HOIST_TARGETS=0), not merely close:
per-row reductions make the batched target sweeps bitwise-equal on the
Pallas path (tile extents per B-tile are unchanged because batches are
tile-aligned).

The runners are lru_cached and the env gate is read at trace time, so each
toggle clears the runner caches.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.solver import clone, project


def _mix2d(n_side=12, seed=3):
    rng = np.random.RandomState(seed)
    xs = np.linspace(-4.5, 4.5, n_side, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    spec = FieldSpec.create((-5, -5), (5, 5), pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def _mix3d(n_side=5, seed=4):
    rng = np.random.RandomState(seed)
    xs = np.linspace(0.1, 0.9, n_side, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                   -1).reshape(-1, 3)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), pos.shape[0], d=3, vdim=3)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def _clear_caches():
    project._runner_2d.cache_clear()
    project._runner_3d.cache_clear()
    clone._clone_runner.cache_clear()


@pytest.fixture
def pallas_backend(monkeypatch):
    monkeypatch.setenv("GF_FIELD_BACKEND", "pallas")
    _clear_caches()
    yield monkeypatch
    _clear_caches()


def _run_project_2d(mix, spec):
    import jax
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("leapfrog")
    test_x = np.asarray(
        np.random.RandomState(0).uniform(-5, 5, (64, 2)), np.float32)
    out = project.project_2d(
        mix, spec, mix, 0.025, scene=scene,
        adv_domain=scene.advance_domain, test_x=test_x,
        key=jax.random.PRNGKey(7), batch_size=256, max_epoch=60,
        check_iter=30, patience=10 ** 6, verbose=0)
    return np.asarray(out.params()["values"]), \
        np.asarray(out.params()["positions"])


def test_project_2d_hoist_identical(pallas_backend):
    mix, spec = _mix2d()
    v1, p1 = _run_project_2d(mix, spec)
    pallas_backend.setenv("GF_HOIST_TARGETS", "0")
    _clear_caches()
    v0, p0 = _run_project_2d(mix, spec)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(p1, p0)


def _run_project_3d(mix, spec):
    import jax
    test_x = np.asarray(
        np.random.RandomState(0).uniform(0, 1, (64, 3)), np.float32)
    out = project.project_3d(
        mix, spec, mix, 0.05, domain=(0, 1, 0, 1, 0, 1), test_x=test_x,
        key=jax.random.PRNGKey(9), scene_name="ring_collide",
        batch_size=256, max_epoch=40, check_iter=20, patience=10 ** 6,
        verbose=0)
    return np.asarray(out.params()["values"]), \
        np.asarray(out.params()["positions"])


def test_project_3d_hoist_identical(pallas_backend):
    mix, spec = _mix3d()
    v1, p1 = _run_project_3d(mix, spec)
    pallas_backend.setenv("GF_HOIST_TARGETS", "0")
    _clear_caches()
    v0, p0 = _run_project_3d(mix, spec)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(p1, p0)


def _run_clone(mix, spec):
    import jax
    test_x = np.asarray(
        np.random.RandomState(0).uniform(-5, 5, (64, 2)), np.float32)
    out = clone.clone_velocity_field(
        mix, spec, lo=(-5, -5), hi=(5, 5), test_x=test_x,
        key=jax.random.PRNGKey(11), seed=0, d=2, batch_size=256,
        max_epoch=40, check_iter=20, patience=10 ** 6, verbose=0)
    return np.asarray(out.params()["values"]), \
        np.asarray(out.params()["positions"])


def test_clone_hoist_identical(pallas_backend):
    mix, spec = _mix2d()
    # stretch some Gaussians so the split + re-fit actually runs
    p = mix.params()
    sca = np.array(p["scalings"])
    sca[::7, 0] += np.log(2.0)
    p["scalings"] = jnp.asarray(sca)
    mix = mix.with_params(p)
    v1, p1 = _run_clone(mix, spec)
    pallas_backend.setenv("GF_HOIST_TARGETS", "0")
    _clear_caches()
    v0, p0 = _run_clone(mix, spec)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(p1, p0)
