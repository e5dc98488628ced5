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
