"""2D analytic velocity fields.

Each field is a single-point pure function ``f(x: (2,)) -> (2,)``; batched
value and Jacobian come from ``jax.vmap`` / ``jax.jacfwd`` — replacing the
reference's hand-coded Jacobians (reference 2D/init_cond.py:138-260) with
AD of the same closed forms. ``taylor_green``'s hand-coded Jacobian is kept
as a test oracle.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def batched(single):
    """(2,)->(2,) field -> {value: (B,2)->(B,2), jac: (B,2)->(B,2,2)}."""
    value = jax.vmap(single)
    jac = jax.vmap(jax.jacfwd(single))
    return value, jac


# ---- vortex building block (reference 2D/init_cond.py:138-156) ----

def vortex_particle_single(x, x0, radius, magnitude):
    eps = 1e-6
    dx = x - x0
    r = jnp.sqrt(jnp.sum(dx * dx))
    exp_term = jnp.exp(-(((r + eps) / radius) ** 2))
    coef = magnitude * (r + eps) ** -2.0 * (1.0 - exp_term)
    return coef * jnp.stack([-dx[1], dx[0]])


# ---- analytic fields ----

def taylor_green_single(x):
    """(reference 2D/init_cond.py:158-167)"""
    return jnp.stack([jnp.sin(x[0]) * jnp.cos(x[1]),
                      -jnp.cos(x[0]) * jnp.sin(x[1])])


def taylor_green_jac_closed(x):
    """Hand-coded Jacobian, kept as an oracle for tests."""
    g00 = jnp.cos(x[:, 0]) * jnp.cos(x[:, 1])
    g01 = -jnp.sin(x[:, 0]) * jnp.sin(x[:, 1])
    return jnp.stack([
        jnp.stack([g00, g01], axis=-1),
        jnp.stack([-g01, -g00], axis=-1),
    ], axis=-2)


def taylor_vortex_single(x, info):
    """(reference 2D/init_cond.py:169-191) — two Gaussian vortices."""
    U, a = info["U"], info["a"]
    out = jnp.zeros(2)
    for key in ("vortex_pos1", "vortex_pos2"):
        x0 = jnp.asarray(info[key])
        dx = x - x0
        r2 = jnp.sum(dx * dx)
        coef = U / a * jnp.exp(0.5 * (1.0 - r2 / a ** 2))
        out = out + coef * jnp.stack([-dx[1], dx[0]])
    return out


def leapfrog_single(x, info):
    """(reference 2D/init_cond.py:193-202) — four regularized vortices."""
    U, a = info["U"], info["a"]
    out = jnp.zeros(2)
    for key, sgn in (("vortex_pos1", 1.0), ("vortex_pos2", 1.0),
                     ("vortex_pos3", -1.0), ("vortex_pos4", -1.0)):
        out = out + vortex_particle_single(
            x, jnp.asarray(info[key]), a, sgn * U)
    return out


def vortices_pass_single(x, info):
    """(reference 2D/init_cond.py:204-209) — counter-rotating vortex pair."""
    U, a = info["U"], info["a"]
    return (vortex_particle_single(x, jnp.asarray(info["vortex_pos1"]), a, U)
            + vortex_particle_single(x, jnp.asarray(info["vortex_pos2"]), a,
                                     -U))


def load_vortex_particles(path=None):
    """48 (x, y, strength) rows from the OBJ-style asset (reference
    2D/init_cond.py:213-223)."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..",
                            "assets", "vortices_pass_particles.obj")
    X, Y, W = [], [], []
    with open(path) as fd:
        for line in fd:
            if line.startswith("v "):
                parts = line.split()
                X.append(float(parts[1]))
                Y.append(float(parts[3]))
                W.append(float(parts[4]))
    return (np.asarray([X, Y], np.float32).T, np.asarray(W, np.float32))


def vortices_pass_particles_single(x, pos, strength):
    """(reference 2D/init_cond.py:225-236) — 48 point vortices with
    softened 1/r^2 kernel."""
    eps = 0.1
    delta = pos - x[None, :]
    rescaled = (strength[:, None] * delta
                / (jnp.sum(delta ** 2, axis=-1)[:, None] + eps)).sum(axis=0)
    return jnp.stack([-rescaled[1], rescaled[0]])


def karman_single(x, info):
    """Uniform inflow (reference 2D/init_cond.py:252-255)."""
    return jnp.stack([jnp.asarray(info["v_magnitude"], jnp.float32),
                      jnp.zeros((), jnp.float32)]) + 0.0 * x[0]


def make_field(name, info):
    """Returns (value_fn, jac_fn) batched over (B, 2) points."""
    if name == "taylor_green":
        return batched(taylor_green_single)
    if name == "taylor_vortex":
        return batched(partial(taylor_vortex_single, info=info))
    if name == "leapfrog":
        return batched(partial(leapfrog_single, info=info))
    if name in ("vortices_pass", "vortices_pass_narrow",
                "vortices_pass_noslip"):
        return batched(partial(vortices_pass_single, info=info))
    if name == "vortices_pass_particles":
        pos, strength = load_vortex_particles()
        return batched(partial(vortices_pass_particles_single,
                               pos=jnp.asarray(pos),
                               strength=jnp.asarray(strength)))
    if name == "karman":
        return batched(partial(karman_single, info=info))
    raise KeyError(f"unknown 2D field: {name!r}")
