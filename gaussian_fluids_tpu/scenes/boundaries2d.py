"""2D boundary samplers.

Two sampler types (reference 2D/init_cond.py:302-428):
  type-1 Dirichlet:  sample(key, n, adv_domain) -> (points, target velocity)
  type-2 normal-flux: sample(key, n, adv_domain) -> (points, normals, flux)

All return *scaled* (target-space) points/values, i.e. the reference's
``target_boundary_sampler_{1,2}`` wrappers are already applied
(reference 2D/init_cond.py:407-417). ``adv_domain`` is the current
(unscaled) advance domain as a (4,) array — dynamic because the Karman
scene grows it every step (reference 2D/init_cond.py:267-271).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_on_domain_boundary_2(key, n, adv_domain, scaling_factor):
    """Free-slip rectangle walls (reference 2D/init_cond.py:306-323)."""
    x_min, x_max, y_min, y_max = (adv_domain[0], adv_domain[1],
                                  adv_domain[2], adv_domain[3])
    x_scale, y_scale = x_max - x_min, y_max - y_min
    t = jax.random.uniform(key, (n,)) * (x_scale + y_scale) * 2.0
    edge1 = (t >= x_scale) & (t < x_scale + y_scale)
    edge2 = (t >= x_scale + y_scale) & (t < 2.0 * x_scale + y_scale)
    edge3 = t >= 2.0 * x_scale + y_scale
    edge0 = ~(edge1 | edge2 | edge3)
    px = jnp.where(edge0, x_min + t,
         jnp.where(edge1, x_max,
         jnp.where(edge2, x_max - t + x_scale + y_scale, x_min)))
    py = jnp.where(edge0, y_min,
         jnp.where(edge1, y_min + t - x_scale,
         jnp.where(edge2, y_max,
                   y_max - t + 2.0 * x_scale + y_scale)))
    nx = jnp.where(edge1, 1.0, jnp.where(edge3, -1.0, 0.0))
    ny = jnp.where(edge0, -1.0, jnp.where(edge2, 1.0, 0.0))
    data = jnp.stack([px, py], axis=-1) * scaling_factor
    normal = jnp.stack([nx, ny], axis=-1)
    return data, normal, jnp.zeros((n,))


def sample_on_sphere(key, n, x, y, r):
    theta = jax.random.uniform(key, (n,)) * 2.0 * np.pi
    data = jnp.stack([r * jnp.cos(theta) + x, r * jnp.sin(theta) + y],
                     axis=-1)
    normal = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return data, normal


def make_samplers(name, info, scaling_factor):
    """Returns (sampler_1 | None, sampler_2 | None) for a scene (the
    registry rows of reference 2D/init_cond.py:419-428)."""
    def domain_only_2(key, n, adv):
        return sample_on_domain_boundary_2(key, n, adv, scaling_factor)

    if name in ("taylor_green", "taylor_vortex", "leapfrog"):
        return None, domain_only_2

    if name in ("vortices_pass", "vortices_pass_narrow"):
        def s2(key, n, adv):
            """Two circles (free-slip) + walls (reference
            2D/init_cond.py:349-356): returns 3n points."""
            k1, k2, k3 = jax.random.split(key, 3)
            r = info["obstacle_radius"]
            d1, n1 = sample_on_sphere(k1, n, *info["obstacle_pos1"], r)
            d2, n2 = sample_on_sphere(k2, n, *info["obstacle_pos2"], r)
            d3, n3, v3 = sample_on_domain_boundary_2(k3, n, adv,
                                                     scaling_factor)
            data = jnp.concatenate([d1 * scaling_factor,
                                    d2 * scaling_factor, d3])
            normal = jnp.concatenate([n1, n2, n3])
            return data, normal, jnp.zeros((3 * n,))
        return None, s2

    if name == "vortices_pass_noslip":
        def s1(key, n, adv):
            """No-slip circles: target velocity 0 (reference
            2D/init_cond.py:341-347): 2n points."""
            k1, k2 = jax.random.split(key)
            r = info["obstacle_radius"]
            d1, _ = sample_on_sphere(k1, n, *info["obstacle_pos1"], r)
            d2, _ = sample_on_sphere(k2, n, *info["obstacle_pos2"], r)
            data = jnp.concatenate([d1, d2]) * scaling_factor
            return data, jnp.zeros((2 * n, 2))
        return s1, domain_only_2

    if name == "vortices_pass_particles":
        def s2(key, n, adv):
            """(reference 2D/init_cond.py:358-364): 2n points."""
            k1, k2 = jax.random.split(key)
            r = info["obstacle_radius"]
            d1, n1 = sample_on_sphere(k1, n, *info["obstacle_pos1"], r)
            d2, n2 = sample_on_sphere(k2, n, *info["obstacle_pos2"], r)
            data = jnp.concatenate([d1, d2]) * scaling_factor
            return data, jnp.concatenate([n1, n2]), jnp.zeros((2 * n,))
        return None, s2

    if name == "karman":
        def s1(key, n, adv):
            """Dirichlet u=0 on the cylinder (reference
            2D/init_cond.py:374-375)."""
            d, _ = sample_on_sphere(key, n, info["obstacle_pos"][0],
                                    info["obstacle_pos"][1],
                                    info["obstacle_radius"])
            return d * scaling_factor, jnp.zeros((n, 2))

        def s2(key, n, adv):
            """5-edge flux sampler with signed inflow/outflow (reference
            2D/init_cond.py:377-405): 5n points."""
            x_min, x_max, y_min, y_max = adv[0], adv[1], adv[2], adv[3]
            x_min_v = info["visualize_x_min"]
            k1, k2 = jax.random.split(key)
            t = jax.random.uniform(k1, (n,)) * (x_max - x_min) + x_min
            t2 = jax.random.uniform(k2, (n,)) * (y_max - y_min) + y_min
            vmag = info["v_magnitude"]
            zeros, ones = jnp.zeros((n,)), jnp.ones((n,))
            data = jnp.concatenate([
                jnp.stack([t, y_min * ones], -1),        # lower
                jnp.stack([t, y_max * ones], -1),        # upper
                jnp.stack([x_min * ones, t2], -1),       # left
                jnp.stack([x_max * ones, t2], -1),       # right
                jnp.stack([x_min_v * ones, t2], -1),     # left of viz domain
            ])
            normal = jnp.concatenate([
                jnp.stack([zeros, ones], -1),
                jnp.stack([zeros, -ones], -1),
                jnp.stack([ones, zeros], -1),
                jnp.stack([-ones, zeros], -1),
                jnp.stack([ones, zeros], -1),
            ])
            nval = jnp.concatenate([zeros, zeros, vmag * ones,
                                    -vmag * ones, vmag * ones])
            return (data * scaling_factor, normal, nval * scaling_factor)
        return s1, s2

    raise KeyError(f"unknown 2D scene: {name!r}")
