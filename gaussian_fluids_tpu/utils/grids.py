"""Grid-point helpers with the reference's exact orderings.

2D (reference 2D/GSR.py:667-672): meshgrid with 'xy' indexing —
y varies slowest, x fastest. 3D (reference 3D/GSR.py:719-725): 'ij'
indexing — x slowest, z fastest. The orderings matter for image reshapes
and .vti layouts.
"""

from __future__ import annotations

import numpy as np


def grid_points_2d(x_min, x_max, y_min, y_max, x_n, y_n) -> np.ndarray:
    xs = np.linspace(x_min, x_max, x_n, dtype=np.float32)
    ys = np.linspace(y_min, y_max, y_n, dtype=np.float32)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    return np.stack([X, Y], axis=-1).reshape(-1, 2)


def grid_points_3d(x_min, x_max, y_min, y_max, z_min, z_max,
                   x_n, y_n, z_n) -> np.ndarray:
    xs = np.linspace(x_min, x_max, x_n, dtype=np.float32)
    ys = np.linspace(y_min, y_max, y_n, dtype=np.float32)
    zs = np.linspace(z_min, z_max, z_n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
