"""CLI flag surface (reference 2D/GSR.py:13-23, 3D/GSR.py:12-23): same
flags, no import-time side effects."""

from gaussian_fluids_tpu.cli import parse_args_2d, parse_args_3d


def test_2d_defaults_match_reference():
    a = parse_args_2d([])
    assert a.init_cond == "taylor_vortex"       # reference 2D/GSR.py:16
    assert a.dt == 0.01 and a.last_time == 10.0  # 2D/GSR.py:19-20
    assert a.start_frame == 0
    assert a.dir == "output_fast"               # 2D/GSR.py:15
    assert a.max_epoch == 20000


def test_3d_defaults_and_extra_flags():
    a = parse_args_3d([])
    assert a.init_cond == "leapfrog"            # reference 3D/GSR.py:16
    assert a.dt == 0.02 and a.last_time == 100.0  # 3D/GSR.py:19-20
    assert a.boundary == 10.0                   # 3D/GSR.py:21
    assert a.density_res_multiplier == 4
    assert a.dir == "output_3d"


def test_overrides_parse():
    a = parse_args_2d(["--init_cond", "leapfrog", "--dt", ".025",
                       "--last_time", "40", "--start_frame", "7",
                       "--max_epoch", "300", "--no_viz", "--seed", "1"])
    assert (a.init_cond, a.dt, a.last_time) == ("leapfrog", 0.025, 40.0)
    assert a.start_frame == 7 and a.max_epoch == 300
    assert a.no_viz and a.seed == 1


def test_profile_flag_captures_trace(tmp_path):
    """--profile DIR wraps the run in a jax.profiler trace
    (utils.profiling.maybe_trace) and leaves TensorBoard/Perfetto
    artifacts in DIR; --profile absent is a no-op."""
    import os

    import jax
    import jax.numpy as jnp

    from gaussian_fluids_tpu.utils.profiling import maybe_trace

    assert parse_args_2d([]).profile is None
    prof_dir = str(tmp_path / "prof")
    a = parse_args_2d(["--profile", prof_dir])
    with maybe_trace(a.profile):
        float(jax.jit(lambda x: x * 2)(jnp.ones(4))[0])
    found = []
    for root, _dirs, files in os.walk(prof_dir):
        found += [os.path.join(root, f) for f in files]
    assert found, "no trace artifacts written"
    with maybe_trace(None):  # no-op path
        pass


def test_checkpoint_npz_fallback_loads_with_torch_present(tmp_path):
    """A checkpoint written by a torch-less environment (.npz sidecar) must
    load in a torch-equipped one (io/checkpoint.py probes what exists)."""
    import numpy as np

    from gaussian_fluids_tpu import FieldSpec, GaussianMixture
    from gaussian_fluids_tpu.io import checkpoint

    spec = FieldSpec.create((-1, -1), (1, 1), 8, d=2, vdim=2)
    rng = np.random.RandomState(0)
    mix = GaussianMixture.create(rng.uniform(-1, 1, (8, 2)), spec,
                                 pad=False)
    params = mix.to_param_dict()
    path = str(tmp_path / "gaussian_velocity_0.pt")
    dr = []
    for a, b in zip(spec.lo, spec.hi):
        dr.extend([float(a), float(b)])
    np.savez(path + ".npz", **params,
             clamp_threshold=spec.clamp_threshold,
             min_grid_scale=spec.min_grid_scale,
             domain_range=np.asarray(dr))
    m2, s2 = checkpoint.load_checkpoint(path)
    assert s2.d == 2 and int(m2.n_alive()) == 8
    np.testing.assert_allclose(
        np.sort(np.asarray(m2.positions)[np.asarray(m2.alive)], axis=0),
        np.sort(np.asarray(params["positions"]), axis=0), rtol=1e-6)
