"""Unit tests for the 2D PNG visualization (io/viz2d.py) — the per-frame
regression artifacts (reference 2D/GSR.py:675-710). The e2e CLI tests run
with --no_viz for speed, so this is the only direct coverage."""

import os

import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.io import viz2d
from gaussian_fluids_tpu.models.mixture import GaussianMixture


def _mix(n=16, seed=0):
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-1, -1), (1, 1), n, d=2, vdim=2)
    pts = rng.uniform(-0.9, 0.9, size=(n, 2)).astype(np.float32)
    return GaussianMixture.create(pts, spec), spec


def test_show_field_heatmap_and_quiver(tmp_path):
    f1 = str(tmp_path / "heat.png")
    viz2d.show_field(lambda xy: np.sin(xy[:, :1].sum(-1, keepdims=True)),
                     -1, 1, -1, 1, dim=1, x_n=20, y_n=20,
                     save_filename=f1)
    f2 = str(tmp_path / "quiver.png")
    viz2d.show_field(lambda xy: np.stack([xy[:, 1], -xy[:, 0]], -1),
                     -1, 1, -1, 1, dim=2, x_n=10, y_n=10,
                     save_filename=f2)
    for f in (f1, f2):
        assert os.path.getsize(f) > 1000  # a real PNG, not an empty stub


def test_show_field_with_ellipse_overlay(tmp_path):
    mix, _ = _mix()
    f = str(tmp_path / "overlay.png")
    viz2d.show_field(lambda xy: np.zeros((xy.shape[0], 2), np.float32),
                     -1, 1, -1, 1, dim=2, x_n=8, y_n=8,
                     additional_drawing=lambda: viz2d.draw_ellipses(mix),
                     save_filename=f)
    assert os.path.getsize(f) > 1000


def test_draw_ellipses_explicit_indices_no_crash():
    mix, _ = _mix(n=5)
    viz2d.draw_ellipses(mix, indices=[0, 2, 4], scattering=False)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_viz_frame_async_matches_sync(tmp_path):
    """The background render worker must produce byte-identical PNGs to
    the synchronous path (round-5: viz rendering moved off the frame
    loop's critical path)."""
    import random

    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver import simulate2d

    scene = get_scene_2d("taylor_green")
    rng = np.random.RandomState(0)
    n = 25
    spec = FieldSpec.create((0, 0), (2 * np.pi, 2 * np.pi), n, d=2, vdim=2)
    pts = rng.uniform(0.5, 5.5, size=(n, 2)).astype(np.float32)
    mix = GaussianMixture.create(pts, spec)
    p = mix.params()
    mix = mix.with_params({**p, "values": 0.1 * rng.randn(
        *np.asarray(p["values"]).shape).astype(np.float32)})

    a = tmp_path / "sync"
    b = tmp_path / "async"
    a.mkdir()
    b.mkdir()
    random.seed(7)  # draw_ellipses samples overlay indices globally
    simulate2d._viz_frame(str(a), "3", mix, spec, scene)
    random.seed(7)
    simulate2d._viz_frame(str(b), "3", mix, spec, scene, asynchronous=True)
    simulate2d.flush_viz()
    names = sorted(os.listdir(a))
    assert names == sorted(os.listdir(b)) and len(names) == 4
    for f in names:
        assert (a / f).read_bytes() == (b / f).read_bytes(), f
