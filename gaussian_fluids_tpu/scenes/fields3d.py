"""3D analytic fields: regularized vortex-ring ensembles.

The reference implements the particle sum and its hand-derived Jacobian as
Taichi CUDA kernels (reference 3D/init_cond.py:115-172). Here the velocity
is a batched jnp contraction over the ring's particles — an MXU/VPU-friendly
(B, n_particles) sweep — and the Jacobian is hand-derived in vectorized form
(same closed form as the reference kernel `vortex_particle_gradient`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def ring_particles(center, normal, radius, n):
    """Particle positions x0 (n,3) and tangent directions w (n,3) on the
    ring (reference 3D/init_cond.py:147-158)."""
    center = np.asarray(center, np.float32)
    normal = np.asarray(normal, np.float32)
    axis_x = np.array([1.0, 0.0, 0.0], np.float32)
    if np.linalg.norm(np.cross(axis_x, normal)) < 1e-5:
        axis_x = np.array([0.0, 1.0, 0.0], np.float32)
    axis_y = np.cross(normal, axis_x)
    axis_y /= np.linalg.norm(axis_y)
    # NOTE reference parity: `normal` is deliberately NOT normalized
    # (reference 3D/init_cond.py:150-152), so axis_x inherits |normal| and
    # a non-unit normal (ring_with_obstacle's (0.2, 0.2, -1)/1.08) traces
    # the same slightly elliptical ring with non-unit tangents as the
    # reference. Do not "fix" without diverging from the reference fields.
    axis_x = np.cross(axis_y, normal)
    theta = np.linspace(0.0, 2.0 * np.pi, n + 1, dtype=np.float32)[:-1]
    x0 = (axis_x[None] * np.cos(theta)[:, None]
          + axis_y[None] * np.sin(theta)[:, None]) * radius + center
    w = (axis_x[None] * -np.sin(theta)[:, None]
         + axis_y[None] * np.cos(theta)[:, None])
    return x0, w


def vortex_particles_velocity(x, x0, w, U, a):
    """u(x) = sum_j U f(r_j) (w_j x delta_j), f(r) = (1 - e^{-(r/a)^3})/r^3
    (reference 3D/init_cond.py:122-132)."""
    delta = x[:, None, :] - x0[None, :, :]        # (B, n, 3)
    r = jnp.linalg.norm(delta, axis=-1)           # (B, n)
    # no r=0 guard, matching the reference kernel exactly (reference
    # 3D/init_cond.py:126-127 computes 1/r^3 unguarded; query points never
    # coincide with ring particles in any scene's sampling)
    fr = (1.0 - jnp.exp(-((r / a) ** 3))) / r ** 3
    cross = jnp.cross(jnp.broadcast_to(w[None], delta.shape), delta)
    return U * jnp.einsum("bn,bnk->bk", fr, cross)


def vortex_particles_jacobian(x, x0, w, U, a):
    """Hand-derived Jacobian (reference 3D/init_cond.py:133-145):
    d/dx [f(r) W delta] = (f'(r)/r) (W delta) delta^T + f(r) W,
    with W the cross-product matrix of w."""
    delta = x[:, None, :] - x0[None, :, :]
    r = jnp.linalg.norm(delta, axis=-1)
    e = jnp.exp(-((r / a) ** 3))
    fr = (1.0 - e) / r ** 3
    fr_prime = -3.0 / r ** 4 * (1.0 - e) + 3.0 / (a ** 3 * r) * e
    wd = jnp.cross(jnp.broadcast_to(w[None], delta.shape), delta)  # (B,n,3)
    term1 = jnp.einsum("bn,bnk,bnl->bkl", fr_prime / r, wd, delta)
    # cross matrix W: W @ v = w x v; sum_n fr_n W_n
    W = jnp.stack([
        jnp.stack([jnp.zeros_like(w[:, 0]), -w[:, 2], w[:, 1]], -1),
        jnp.stack([w[:, 2], jnp.zeros_like(w[:, 0]), -w[:, 0]], -1),
        jnp.stack([-w[:, 1], w[:, 0], jnp.zeros_like(w[:, 0])], -1),
    ], axis=-2)                                   # (n, 3, 3)
    term2 = jnp.einsum("bn,nkl->bkl", fr, W)
    return U * (term1 + term2)


@dataclasses.dataclass
class Ring:
    center: Tuple[float, float, float]
    normal: Tuple[float, float, float]
    radius: float
    thickness: float
    strength: float
    n: int

    def particle_args(self):
        x0, w = ring_particles(self.center, self.normal, self.radius, self.n)
        # reference: vortex_particle(x, x0, w*strength, radius/(2n), thick)
        return (jnp.asarray(x0), jnp.asarray(w * self.strength),
                self.radius / (2.0 * self.n), self.thickness)


def make_ring_field(rings):
    def velocity(x):
        out = jnp.zeros_like(x)
        for ring in rings:
            x0, w, U, a = ring.particle_args()
            out = out + vortex_particles_velocity(x, x0, w, U, a)
        return out

    def jac(x):
        out = jnp.zeros((x.shape[0], 3, 3), x.dtype)
        for ring in rings:
            x0, w, U, a = ring.particle_args()
            out = out + vortex_particles_jacobian(x, x0, w, U, a)
        return out

    return velocity, jac


# ---- registry data (reference 3D/init_cond.py:13-108) ----

DOMAIN = {
    "leapfrog": (0.0, 1.0, 0.0, 1.0, 0.0, 1.0),
    "single_vortex_ring": (0.0, 1.0, 0.0, 1.0, 0.0, 1.0),
    "ring_collide": (0.0, 1.0, 0.0, 1.0, 0.0, 1.0),
    "ring_with_obstacle": (0.0, 1.0, 0.0, 1.0, 0.0, 1.0),
}

PARTICLE_COUNT = {
    "leapfrog": (10, 10, 10),
    "single_vortex_ring": (40, 40, 40),
    "ring_collide": (40, 40, 40),
    "ring_with_obstacle": (40, 40, 40),
}

VISUALIZE_RES = {name: (128, 128, 128) for name in DOMAIN}

_N = 1.0 / 1.08
OTHER_INFO = {
    "leapfrog": {
        "ring1": Ring((0.75, 0.5, 0.5), (-1.0, 0.0, 0.0), 1.0 / 6,
                      0.12 / 6, 0.1 / 6, 500),
        "ring2": Ring((0.85, 0.5, 0.5), (-1.0, 0.0, 0.0), 0.7 / 6,
                      0.12 / 6, 0.1 / 6, 500),
    },
    "single_vortex_ring": {
        "ring1": Ring((0.5, 0.5, 0.5), (1.0, 0.0, 0.0), 1.0 / 6,
                      0.1 / 6, 0.1 / 6, 500),
    },
    "ring_collide": {
        "ring1": Ring((-0.5 / 6 + 0.5, 0.5, 0.5), (1.0, 0.0, 0.0), 0.3 / 6,
                      0.12 / 6, 0.1 / 6, 500),
        "ring2": Ring((0.5 / 6 + 0.5, 0.5, 0.5), (-1.0, 0.0, 0.0), 0.3 / 6,
                      0.12 / 6, 0.1 / 6, 500),
    },
    "ring_with_obstacle": {
        "obj_file": "bunny.obj",
        "scale": 1.0 / 4.8,
        "translate": (0.8225, 0.3150, 0.2650),
        "ring1": Ring((0.475, 0.6, 0.53), (0.2 * _N, 0.2 * _N, -1.0 * _N),
                      0.05, 0.02, 0.2 / 6, 500),
        "ring2": Ring((0.4380, 0.5630, 0.7152),
                      (0.2 * _N, 0.2 * _N, -1.0 * _N),
                      0.05, 0.02, 0.2 / 6, 500),
    },
}


@dataclasses.dataclass
class Scene3D:
    name: str
    domain: Tuple[float, ...]
    particle_count: Tuple[int, int, int]
    visualize_res: Tuple[int, int, int]
    info: Dict
    velocity: Callable
    velocity_jac: Callable
    boundary_sampler: Optional[Callable]  # (key, n) -> (points, normals)
    mesh_sampler: Optional[object] = None


def build_scene(name: str) -> Scene3D:
    from gaussian_fluids_tpu.scenes import boundaries3d
    if name not in DOMAIN:
        raise KeyError(f"unknown 3D scene {name!r}; valid: {sorted(DOMAIN)}")
    info = OTHER_INFO[name]
    rings = [v for v in info.values() if isinstance(v, Ring)]
    vel, jac = make_ring_field(rings)
    mesh = None
    if "obj_file" in info:
        mesh = boundaries3d.load_obstacle_mesh(info)
    sampler = boundaries3d.make_sampler(name, DOMAIN[name], mesh)
    return Scene3D(name=name, domain=DOMAIN[name],
                   particle_count=PARTICLE_COUNT[name],
                   visualize_res=VISUALIZE_RES[name], info=info,
                   velocity=vel, velocity_jac=jac,
                   boundary_sampler=sampler, mesh_sampler=mesh)
