"""Grid-point helpers with the reference's exact orderings.

2D (reference 2D/GSR.py:667-672): meshgrid with 'xy' indexing —
y varies slowest, x fastest. 3D (reference 3D/GSR.py:719-725): 'ij'
indexing — x slowest, z fastest. The orderings matter for image reshapes
and .vti layouts.
"""

from __future__ import annotations

import numpy as np


def sweep_group(n: int, b: int, cap: int = 262144) -> int:
    """Largest divisor g of n with g*b <= cap (min 1): how many epochs'
    sample batches share one hoisted exact-target sweep (solver/project,
    solver/clone). Bigger sweeps amortize per-launch overhead; ``cap``
    bounds the sweep's working set (at cap the 3D val+jac output is ~13 MB
    and every intermediate is tile-local in the Pallas kernel)."""
    g = max(1, min(n, cap // max(b, 1)))
    while n % g:
        g -= 1
    return g


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


def pad_chunks(x, d: int, b: int, chunk: int = 0):
    """Split (b, d) points into fixed-shape chunks for jitted lax.map
    sweeps: returns ((nchunk, chunk, d) points, (nchunk, chunk) validity
    weights). The default chunk adapts to the backend — big chunks amortize
    per-eval overhead on TPU, but on the dense (CPU / GF_FIELD_BACKEND=
    dense) path each chunk materializes a (chunk, N) kernel matrix, so stay
    small there."""
    import jax
    import jax.numpy as jnp
    if b == 0:
        raise ValueError("pad_chunks: empty point set (b=0)")
    if chunk == 0:
        chunk = 32768 if jax.default_backend() in ("tpu", "axon") else 4096
    chunk = min(chunk, b)
    nchunk = -(-b // chunk)
    xp = jnp.zeros((nchunk * chunk, d), jnp.float32).at[:b].set(x)
    valid = (jnp.arange(nchunk * chunk) < b).reshape(nchunk, chunk) * 1.0
    return xp.reshape(nchunk, chunk, d), valid
