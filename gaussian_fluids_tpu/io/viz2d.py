"""2D visualization: per-frame PNGs matching the reference artifacts
(velocity quiver + Gaussian ellipses, clean velocity, vorticity and
divergence heatmaps — reference 2D/GSR.py:675-710)."""

from __future__ import annotations

import random

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Ellipse  # noqa: E402

from gaussian_fluids_tpu.utils.grids import grid_points_2d  # noqa: E402


def show_field(field_fn, x_min, x_max, y_min, y_max, dim=1,
               x_n=100, y_n=100, additional_drawing=None,
               save_filename=None):
    """Quiver (dim=2) or jet heatmap (dim=1) of a field callable
    ((B,2)->(B,dim)) over a grid (reference 2D/GSR.py:675-698)."""
    xy = grid_points_2d(x_min, x_max, y_min, y_max, x_n, y_n)
    out = np.asarray(field_fn(xy))
    if dim == 1:
        h = out.reshape(y_n, x_n)
        plt.axis("equal")
        plt.imshow(h, extent=[x_min, x_max, y_min, y_max], origin="lower",
                   cmap="jet")
        plt.colorbar()
    else:
        u, v = out[:, 0], out[:, 1]
        plt.axis("equal")
        if np.any((u ** 2 + v ** 2) != 0):
            plt.quiver(xy[:, 0], xy[:, 1], u, v)
    if additional_drawing:
        additional_drawing()
    if save_filename:
        plt.savefig(save_filename)
        plt.clf()
    plt.close("all")


def draw_ellipses(mix, indices=None, scattering=True, max_ellipses=20):
    """Overlay Gaussian 1-sigma ellipses (reference 2D/GSR.py:701-710)."""
    m = mix.compact()
    pos = np.asarray(m.positions)
    sca = np.asarray(m.scalings)
    rot = np.asarray(m.rotations)
    if scattering:
        plt.scatter(pos[:, 0], pos[:, 1], s=0.5, color="red")
    ax = plt.gca()
    n = pos.shape[0]
    ids = (random.sample(range(n), min(max_ellipses, n))
           if indices is None else indices)
    for i in ids:
        width, height = 1.0 / np.exp(sca[i])
        ax.add_patch(Ellipse(pos[i], width, height,
                             angle=rot[i] / np.pi * 180.0, fill=False))
