"""Trilinear grid interpolation (the reference's smoke-advection kernel
``ti_get_interp_val``, reference 3D/advance_density.py:23-50): node-centered
grid over the domain with spacing (extent / (n - 1)), floor-indexed with the
high neighbor clamped to the last node.

Pure gather-based jnp — vectorized over arbitrary leading dims.
"""

from __future__ import annotations

import functools

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


def bilinear_interp(field: jnp.ndarray, positions: jnp.ndarray,
                    domain) -> jnp.ndarray:
    """2D analog of :func:`trilinear_interp`. field: (nx, ny);
    positions: (..., 2) -> (...). ``domain`` is (x_min, x_max, y_min,
    y_max) and may hold traced scalars (the karman advance domain moves
    per frame)."""
    x_min, x_max, y_min, y_max = domain
    nx, ny = field.shape
    lo = jnp.stack([jnp.asarray(x_min, jnp.float32),
                    jnp.asarray(y_min, jnp.float32)])
    dxy = jnp.stack([(x_max - x_min) / (nx - 1),
                     (y_max - y_min) / (ny - 1)]).astype(jnp.float32)
    p = (positions - lo) / dxy
    i0 = jnp.floor(p).astype(jnp.int32)
    w = p - i0.astype(jnp.float32)
    hi = jnp.asarray([nx - 1, ny - 1], jnp.int32)
    i0 = jnp.clip(i0, 0, hi)
    i1 = jnp.minimum(i0 + 1, hi)
    wx, wy = w[..., 0], w[..., 1]
    x0, y0 = i0[..., 0], i0[..., 1]
    x1, y1 = i1[..., 0], i1[..., 1]
    return (field[x0, y0] * (1 - wx) * (1 - wy)
            + field[x1, y0] * wx * (1 - wy)
            + field[x0, y1] * (1 - wx) * wy
            + field[x1, y1] * wx * wy)


def multi_channel_interp(field: jnp.ndarray, positions: jnp.ndarray,
                         domain) -> jnp.ndarray:
    """Channels-last bi/trilinear interpolation: field (nx, ny[, nz], C),
    positions (..., d) -> (..., C). Dispatches on positions' last dim so
    2D/3D call sites share one helper (``domain`` is (x_min, x_max, ...)
    per the scalar variants and may hold traced values)."""
    import jax

    f = bilinear_interp if positions.shape[-1] == 2 else trilinear_interp
    return jax.vmap(lambda ch: f(ch, positions, domain),
                    in_axes=-1, out_axes=-1)(field)


@functools.lru_cache(maxsize=None)
def _ring_builder(shape, domain):
    """Cached jitted ring seeder for a (shape, domain): center/normal/
    radius/thickness are runtime args, so seeding the second ring of a
    scene (or re-seeding on replay) reuses the first's compilation —
    lowering costs tens of seconds on the tunneled TPU runtime."""
    import jax

    nx, ny, nz = shape
    x_min, x_max, y_min, y_max, z_min, z_max = domain

    @jax.jit
    def build(center, normal, radius, thickness):
        xs = jnp.linspace(x_min, x_max, nx, dtype=jnp.float32)
        ys = jnp.linspace(y_min, y_max, ny, dtype=jnp.float32)
        zs = jnp.linspace(z_min, z_max, nz, dtype=jnp.float32)
        X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
        pos = jnp.stack([X, Y, Z], -1)
        n = normal / jnp.linalg.norm(normal)
        rel = pos - center
        proj = pos - (rel @ n)[..., None] * n
        rad_vec = proj - center
        rad_len = jnp.linalg.norm(rad_vec, axis=-1)
        outside_inner = rad_len >= radius - thickness
        safe = jnp.maximum(rad_len, 1e-12)[..., None]
        nearest = center + rad_vec / safe * radius
        close = jnp.linalg.norm(pos - nearest, axis=-1) <= thickness
        return (outside_inner & close).astype(jnp.float32)

    return build


def seed_ring_density(shape, domain, center, normal, radius,
                      thickness) -> jnp.ndarray:
    """Seed a solid-torus indicator density (the reference's
    ``ti_set_ring``, 3D/advance_density.py:13-21).

    Computed ON DEVICE under jit: at the reference 512^3 grid the same
    math in host numpy walks ~10 separate 1.6 GB temporaries through one
    core (~8 minutes); fused on the accelerator it is sub-second."""
    build = _ring_builder(tuple(shape), tuple(domain))
    return build(jnp.asarray(center, jnp.float32),
                 jnp.asarray(normal, jnp.float32),
                 jnp.asarray(radius, jnp.float32),
                 jnp.asarray(thickness, jnp.float32))
