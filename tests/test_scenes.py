"""Scene registries: analytic fields vs AD, boundary samplers on-surface,
mesh sampling (SURVEY.md §4 analytic-oracle strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu.scenes import get_scene_2d, get_scene_3d
from gaussian_fluids_tpu.scenes.registry2d import SCENES_2D


@pytest.mark.parametrize("name", SCENES_2D)
def test_2d_scene_builds_and_evaluates(name):
    scene = get_scene_2d(name)
    x0, x1, y0, y1 = scene.initialize_domain
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform((x0 + x1) / 2 - 0.1, (x0 + x1) / 2 + 0.1,
                                (8, 2)), jnp.float32)
    v = scene.velocity(x)
    j = scene.velocity_jac(x)
    assert v.shape == (8, 2) and j.shape == (8, 2, 2)
    assert np.all(np.isfinite(np.asarray(v)))
    assert np.all(np.isfinite(np.asarray(j)))


@pytest.mark.parametrize("name", ["taylor_vortex", "leapfrog",
                                  "vortices_pass"])
def test_2d_fields_divergence_free(name):
    scene = get_scene_2d(name)
    x0, x1, y0, y1 = scene.initialize_domain
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(x0 + 0.1 * (x1 - x0), x1 - 0.1 * (x1 - x0),
                                (32, 2)), jnp.float32)
    j = np.asarray(scene.velocity_jac(x))
    np.testing.assert_allclose(j[:, 0, 0] + j[:, 1, 1], 0.0, atol=2e-4)


def test_unknown_scene_raises_with_valid_names():
    with pytest.raises(KeyError) as ei:
        get_scene_2d("taylor_gren")
    assert "taylor_green" in str(ei.value)


def test_2d_boundary_samplers_shapes():
    key = jax.random.PRNGKey(0)
    for name in SCENES_2D:
        scene = get_scene_2d(name)
        adv = jnp.asarray(scene.advance_domain, jnp.float32)
        if scene.boundary_sampler_1 is not None:
            d, v = scene.boundary_sampler_1(key, 16, adv)
            assert d.shape[0] == v.shape[0] and d.shape[1] == 2
        if scene.boundary_sampler_2 is not None:
            d, n, r = scene.boundary_sampler_2(key, 16, adv)
            assert d.shape[0] == n.shape[0] == r.shape[0]
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-5)


def test_2d_domain_boundary_sampler_on_walls():
    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    d, n, r = scene.boundary_sampler_2(jax.random.PRNGKey(3), 64, adv)
    d = np.asarray(d) / sf
    on_wall = (np.isclose(d[:, 0], -5) | np.isclose(d[:, 0], 5)
               | np.isclose(d[:, 1], -5) | np.isclose(d[:, 1], 5))
    assert on_wall.all()
    np.testing.assert_allclose(np.asarray(r), 0.0)


def test_3d_ring_field_jacobian_matches_ad():
    scene = get_scene_3d("leapfrog")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (8, 3)), jnp.float32)
    j_hand = scene.velocity_jac(x)
    j_ad = jax.vmap(jax.jacfwd(lambda p: scene.velocity(p[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(j_hand), np.asarray(j_ad),
                               rtol=2e-2, atol=1e-5)


def test_3d_ring_field_divergence_free():
    scene = get_scene_3d("ring_collide")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (32, 3)), jnp.float32)
    j = np.asarray(scene.velocity_jac(x))
    div = j[:, 0, 0] + j[:, 1, 1] + j[:, 2, 2]
    np.testing.assert_allclose(div, 0.0, atol=1e-4)


def test_3d_box_sampler_on_faces_inward_normals():
    scene = get_scene_3d("leapfrog")
    d, n = scene.boundary_sampler(jax.random.PRNGKey(1), 128)
    d, n = np.asarray(d), np.asarray(n)
    on_face = np.any(np.isclose(d, 0.0) | np.isclose(d, 1.0), axis=-1)
    assert on_face.all()
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    # normals point inward: from x_min face, normal is +x
    at_xmin = np.isclose(d[:, 0], 0.0)
    if at_xmin.any():
        np.testing.assert_allclose(n[at_xmin, 0], 1.0)


def test_mesh_obstacle_sampler():
    scene = get_scene_3d("ring_with_obstacle")
    d, n = scene.boundary_sampler(jax.random.PRNGKey(2), 64)
    assert d.shape == (128, 3)  # box n + mesh n
    mesh_pts = np.asarray(d)[64:]
    # substitute obstacle must land inside the unit domain
    assert (mesh_pts > 0).all() and (mesh_pts < 1).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n)[64:], axis=-1),
                               1.0, atol=1e-4)


def test_karman_moving_domain_hooks():
    """extra_advect grows the left edge by inflow * dt, capped at the
    visualization domain (reference 2D/init_cond.py:267-271); resuming at
    frame k reconstructs the same domain (karman_extra_loader,
    2D/init_cond.py:284-298)."""
    from gaussian_fluids_tpu.scenes import get_scene_2d
    sc = get_scene_2d("karman")
    dt = 0.05
    adv = sc.advance_domain_at(0, dt)
    assert adv == tuple(sc.advance_domain)
    stepped = adv
    for _ in range(5):
        stepped = sc.extra_advect(stepped, dt)
    resumed = sc.advance_domain_at(5, dt)
    assert np.allclose(stepped, resumed)
    assert stepped[0] > adv[0]  # left edge advances with the inflow
    assert stepped[1:] == adv[1:]
    # cap at the visualization domain
    far = sc.advance_domain_at(100000, dt)
    assert far[0] == sc.visualize_domain[0]
    # non-karman scenes: no-op
    lf = get_scene_2d("leapfrog")
    assert lf.extra_advect(lf.advance_domain, dt) == lf.advance_domain


def test_write_centers_obj(tmp_path):
    """Reference parity: the Gaussian-centres OBJ dump (3D/GSR.py:745-748)
    writes one `v` line per ALIVE Gaussian."""
    from gaussian_fluids_tpu.config import FieldSpec
    from gaussian_fluids_tpu.models.mixture import GaussianMixture
    from gaussian_fluids_tpu.scenes.mesh import write_centers_obj

    pts = np.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], np.float32)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), 2, d=3, vdim=3)
    mix = GaussianMixture.create(pts, spec)  # pads to a 512 bucket
    p = str(tmp_path / "centers.obj")
    write_centers_obj(mix, p)
    lines = open(p).read().splitlines()
    assert len(lines) == 2 and all(l.startswith("v ") for l in lines)
    assert np.allclose([float(x) for x in lines[0].split()[1:]], pts[0])
    # 2D mixtures get z = 0
    spec2 = FieldSpec.create((0, 0), (1, 1), 2, d=2, vdim=2)
    mix2 = GaussianMixture.create(pts[:, :2], spec2)
    write_centers_obj(mix2, p)
    lines = open(p).read().splitlines()
    assert len(lines) == 2 and lines[0].split()[3] == "0.0"
