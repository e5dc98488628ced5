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
