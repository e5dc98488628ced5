"""Trilinear grid interpolation (the reference's smoke-advection kernel
``ti_get_interp_val``, reference 3D/advance_density.py:23-50): node-centered
grid over the domain with spacing (extent / (n - 1)), floor-indexed with the
high neighbor clamped to the last node.

Pure gather-based jnp — vectorized over arbitrary leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear_interp(field: jnp.ndarray, positions: jnp.ndarray,
                     domain) -> jnp.ndarray:
    """field: (nx, ny, nz); positions: (..., 3) -> (...)."""
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    nx, ny, nz = field.shape
    lo = jnp.asarray([x_min, y_min, z_min], jnp.float32)
    dxyz = jnp.asarray([(x_max - x_min) / (nx - 1),
                        (y_max - y_min) / (ny - 1),
                        (z_max - z_min) / (nz - 1)], jnp.float32)
    p = (positions - lo) / dxyz
    i0 = jnp.floor(p).astype(jnp.int32)
    w = p - i0.astype(jnp.float32)
    hi = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    i0 = jnp.clip(i0, 0, hi)
    i1 = jnp.minimum(i0 + 1, hi)

    def g(ix, iy, iz):
        return field[ix, iy, iz]

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    return (g(x0, y0, z0) * (1 - wx) * (1 - wy) * (1 - wz)
            + g(x1, y0, z0) * wx * (1 - wy) * (1 - wz)
            + g(x0, y1, z0) * (1 - wx) * wy * (1 - wz)
            + g(x1, y1, z0) * wx * wy * (1 - wz)
            + g(x0, y0, z1) * (1 - wx) * (1 - wy) * wz
            + g(x1, y0, z1) * wx * (1 - wy) * wz
            + g(x0, y1, z1) * (1 - wx) * wy * wz
            + g(x1, y1, z1) * wx * wy * wz)


def seed_ring_density(shape, domain, center, normal, radius,
                      thickness) -> jnp.ndarray:
    """Seed a solid-torus indicator density (the reference's
    ``ti_set_ring``, 3D/advance_density.py:13-21)."""
    import numpy as np
    nx, ny, nz = shape
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    xs = np.linspace(x_min, x_max, nx, dtype=np.float32)
    ys = np.linspace(y_min, y_max, ny, dtype=np.float32)
    zs = np.linspace(z_min, z_max, nz, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pos = np.stack([X, Y, Z], -1)
    center = np.asarray(center, np.float32)
    normal = np.asarray(normal, np.float32)
    normal = normal / np.linalg.norm(normal)
    rel = pos - center
    proj = pos - (rel @ normal)[..., None] * normal
    rad_vec = proj - center
    rad_len = np.linalg.norm(rad_vec, axis=-1)
    outside_inner = rad_len >= radius - thickness
    safe = np.maximum(rad_len, 1e-12)[..., None]
    nearest = center + rad_vec / safe * radius
    close = np.linalg.norm(pos - nearest, axis=-1) <= thickness
    return jnp.asarray((outside_inner & close).astype(np.float32))
