"""RK4 point advection through the Gaussian velocity field, optionally with
the deformation gradient of the flow map.

Mirrors the reference kernel `advection_rk4_ti` (reference 2D/GSR.py:549-592,
3D/GSR.py:634-677): classic RK4 for the position, and the tangent chain

    dphi_k = I + dt * c_k * (dv_k @ dphi_{k-1})

for the deformation. Built on the batched field evaluation, so it runs as a
handful of fused MXU matmuls instead of the reference's per-thread scalar
loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field


def rk4_advect(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
               dt, with_deformation: bool = False,
               presorted: bool = False):
    """Advect points x for time dt.

    Returns phi (B, d), or (phi, dphi, v_phi, dv_phi) when
    ``with_deformation`` — matching the reference's
    ``pos_only=False`` outputs (goal_pos, deformation, goal_val, goal_grad).
    """
    if not with_deformation:
        return rk4_advect_pos(mix, spec, x, dt, presorted=presorted)
    f = lambda p: field.value_and_jac(mix, spec, p, presorted=presorted)
    return rk4_deformation_stages(f, x, dt)


def rk4_deformation_stages(f, x: jnp.ndarray, dt):
    """RK4 with the deformation-gradient tangent chain through an arbitrary
    ``f(points) -> (velocities, jacobians)`` closure — THE single copy of
    the deformed stage sequence (reference 2D/GSR.py:565-574,
    3D/GSR.py:650-662); the single-device and sharded covector paths both
    build on it so the tangent-chain math cannot drift between copies.
    Returns (phi, dphi, v_phi, dv_phi)."""
    v, dv = f(x)
    phi1 = x + dt * 0.5 * v
    v1, dv1 = f(phi1)
    phi2 = x + dt * 0.5 * v1
    v2, dv2 = f(phi2)
    phi3 = x + dt * v2
    v3, dv3 = f(phi3)
    phi = x + dt / 6.0 * (v + 2.0 * v1 + 2.0 * v2 + v3)

    eye = jnp.eye(x.shape[-1], dtype=x.dtype)[None]
    mm = lambda a, b: jnp.einsum("bij,bjk->bik", a, b)
    dphi1 = eye + dt * 0.5 * dv
    dv1x = mm(dv1, dphi1)
    dphi2 = eye + dt * 0.5 * dv1x
    dv2x = mm(dv2, dphi2)
    dphi3 = eye + dt * dv2x
    dphi = eye + dt / 6.0 * (dv + 2.0 * dv1x + 2.0 * dv2x + mm(dv3, dphi3))
    v_phi, dv_phi = f(phi)
    return phi, dphi, v_phi, dv_phi


def rk4_pos_stages(f, x: jnp.ndarray, dt) -> jnp.ndarray:
    """Classic position-only RK4 through an arbitrary velocity closure
    ``f(points) -> velocities`` — THE single copy of the stage sequence
    (reference 2D/GSR.py:560-564); every value-only advection/backtrace
    path builds on it so the stage math cannot drift between copies."""
    v = f(x)
    v1 = f(x + dt * 0.5 * v)
    v2 = f(x + dt * 0.5 * v1)
    v3 = f(x + dt * v2)
    return x + dt / 6.0 * (v + 2.0 * v1 + 2.0 * v2 + v3)


def rk4_advect_pos(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                   dt, presorted: bool = False) -> jnp.ndarray:
    """Position-only RK4 (reference ``pos_only=True``, 2D/GSR.py:560-564):
    every stage needs only the velocity, so the Jacobian contractions are
    skipped entirely (value-only kernel mode on the Pallas path)."""
    f = lambda p: field.value(mix, spec, p, presorted=presorted,
                              need_dx=False)
    return rk4_pos_stages(f, x, dt)
