"""Multi-chip reachable from the CLI entry points: ``--mesh BxG`` routes
the production frame loops (advance2d/advance3d/advance_density3d) through
the sharded runners (parallel/driver.py, parallel/density.py) on the
8-device virtual mesh. Reference analog: its whole device story was a CLI
flag (2D/GSR.py:26-30); multi-chip is new scope (SURVEY.md §2.8)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu.cli import parse_args_2d, parse_args_3d, parse_mesh


def test_parse_mesh():
    assert parse_mesh(None) is None
    assert parse_mesh("") is None
    assert parse_mesh("4x2") == (4, 2)
    assert parse_mesh("8") == (8, 1)
    for bad in ("4x2x1", "ax2", "0x2", "-1"):
        with pytest.raises(SystemExit):
            parse_mesh(bad)


def test_mesh_flag_parses_through_cli():
    a = parse_args_2d(["--mesh", "4x2"])
    assert a.mesh == (4, 2)
    a = parse_args_3d(["--mesh", "8"])
    assert a.mesh == (8, 1)
    assert parse_args_2d([]).mesh is None


def test_mesh_rejects_target_grid():
    from gaussian_fluids_tpu.parallel import mesh_from_shape
    with pytest.raises(ValueError, match="target_grid"):
        mesh_from_shape((4, 2), target_grid_res=64)
    assert mesh_from_shape(None, target_grid_res=64) is None


def test_mesh_rejects_too_many_devices():
    from gaussian_fluids_tpu.parallel import mesh_from_shape
    with pytest.raises(ValueError, match="devices"):
        mesh_from_shape((64, 2))


@pytest.fixture(scope="module")
def tg_init(tmp_path_factory):
    from gaussian_fluids_tpu.solver.simulate2d import initialize_2d
    out = str(tmp_path_factory.mktemp("tg_mesh"))
    initialize_2d("taylor_green", out, max_epoch=200, viz=False,
                  particle_count=(10, 10), verbose=0)
    return out


def test_advance2d_mesh_two_frames(tg_init, monkeypatch):
    """Drive the advance2d entry point (CLI parse -> advance_2d, exactly
    the shim body) with --mesh 4x2 for two frames on the 8-device virtual
    mesh: the sharded frame loop must produce reference-format checkpoints
    whose field still matches the analytic Taylor-Green solution about as
    well as the single-device loop does (same gate as
    tests/test_e2e_2d.py::test_advance_two_frames)."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.io import checkpoint
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.simulate2d import advance_2d

    args = parse_args_2d(["--init_cond", "taylor_green", "--dir", tg_init,
                          "--dt", ".001", "--last_time", ".002",
                          "--max_epoch", "100", "--no_viz",
                          "--mesh", "4x2"])
    advance_2d(args.init_cond, args.dir, args.dt, args.last_time,
               start_frame=args.start_frame, max_epoch=args.max_epoch,
               seed=args.seed, viz=not args.no_viz,
               target_grid_res=args.target_grid, mesh_shape=args.mesh,
               verbose=0, test_res=(30, 30))
    for n in (1, 2):
        assert os.path.exists(
            os.path.join(tg_init, f"gaussian_velocity_{n}.pt"))
    mix, spec = checkpoint.load_checkpoint(
        os.path.join(tg_init, "gaussian_velocity_2.pt"))
    scene = get_scene_2d("taylor_green")
    sf = scene.scaling_factor
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0.5, 5.5, (64, 2)), jnp.float32)
    v, _ = field.value_and_jac(mix, spec, x * sf)
    ref = scene.target_velocity(x * sf)
    err = float(jnp.abs(v - ref).mean())
    scale = float(jnp.abs(ref).mean())
    assert err < scale, (err, scale)


def test_advance3d_mesh_one_frame(tmp_path, monkeypatch):
    """The 3D frame loop with --mesh: sharded clone + sharded projection
    for one frame keeps the field finite and writes the checkpoint."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.io import checkpoint
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.solver.simulate3d import (advance_3d,
                                                       initialize_3d)

    out = str(tmp_path)
    initialize_3d("leapfrog", out, max_epoch=60, batch_size=256, viz=False,
                  particle_count=(5, 5, 5), verbose=0)
    args = parse_args_3d(["--init_cond", "leapfrog", "--dir", out,
                          "--dt", ".1", "--last_time", ".1",
                          "--max_epoch", "100", "--no_viz",
                          "--mesh", "4x2"])
    advance_3d(args.init_cond, args.dir, args.dt, args.last_time,
               start_frame=args.start_frame, max_epoch=args.max_epoch,
               boundary_lambda=args.boundary, seed=args.seed,
               viz=not args.no_viz, target_grid_res=args.target_grid,
               mesh_shape=args.mesh, batch_size=256, verbose=0,
               test_res=(6, 6, 6))
    path = os.path.join(out, "gaussian_velocity_1.pt")
    assert os.path.exists(path)
    mix, spec = checkpoint.load_checkpoint(path)
    v, j = field.value_and_jac(mix, spec, jnp.zeros((4, 3), jnp.float32))
    assert np.isfinite(np.asarray(v)).all()
    assert np.isfinite(np.asarray(j)).all()


def test_advance_density_mesh(tmp_path, monkeypatch):
    """advance_density with --mesh shards the semi-Lagrangian replay and
    produces the same volumes as the single-device replay."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.io import checkpoint
    from gaussian_fluids_tpu import FieldSpec, GaussianMixture
    from gaussian_fluids_tpu.scenes import get_scene_3d
    from gaussian_fluids_tpu.solver.simulate3d import advance_density

    scene = get_scene_3d("ring_collide")
    dom = scene.domain
    rng = np.random.RandomState(3)
    n = 64
    pos = rng.uniform([dom[0], dom[2], dom[4]], [dom[1], dom[3], dom[5]],
                      (n, 3))
    spec = FieldSpec.create((dom[0], dom[2], dom[4]),
                            (dom[1], dom[3], dom[5]), n, d=3, vdim=3)
    mix = GaussianMixture.create(pos, spec, pad=False)
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          jnp.asarray(0.1 * rng.randn(n, 3), jnp.float32),
                          mix.alive).spatially_sorted()

    single = str(tmp_path / "single")
    meshd = str(tmp_path / "mesh")
    for d in (single, meshd):
        os.makedirs(d)
        checkpoint.save_checkpoint(
            os.path.join(d, "gaussian_velocity_0.pt"), mix, spec)
    advance_density("ring_collide", single, dt=.05, grid_res=(12, 12, 12),
                    verbose=0)
    advance_density("ring_collide", meshd, dt=.05, grid_res=(12, 12, 12),
                    verbose=0, mesh_shape=(4, 2))
    for tag in ("a", "b"):
        pa = os.path.join(single, f"density_{tag}_1.vti")
        pb = os.path.join(meshd, f"density_{tag}_1.vti")
        assert os.path.exists(pa) and os.path.exists(pb)
        assert abs(os.path.getsize(pa) - os.path.getsize(pb)) < 1024

    # and the step itself matches the single-device step numerically
    from gaussian_fluids_tpu.ops import interp
    from gaussian_fluids_tpu.parallel import sharding
    from gaussian_fluids_tpu.parallel.density import advected_density_sharded
    from gaussian_fluids_tpu.solver.simulate3d import advected_density
    from gaussian_fluids_tpu.scenes.fields3d import Ring
    ring = next(v for v in scene.info.values() if isinstance(v, Ring))
    dens0 = interp.seed_ring_density((12, 12, 12), dom, ring.center,
                                     ring.normal, ring.radius,
                                     ring.thickness)
    d_single = advected_density(dens0, mix, spec, dom, .05, (12, 12, 12))
    d_mesh = advected_density_sharded(dens0, mix, spec, dom, .05,
                                      (12, 12, 12),
                                      sharding.make_mesh(4, 2))
    np.testing.assert_allclose(np.asarray(d_single), np.asarray(d_mesh),
                               rtol=2e-4, atol=2e-5)
