"""Advected covector-field targets: the vorticity (and helicity) the new
field must match after one transport step.

2D (reference 2D/advance.py:9-56): backtrace x through the old velocity by
-dt with RK4; the target vorticity at x is curl u_old at the backtraced
point, zeroed where the backtrace leaves the advance domain (2D vorticity
is materially conserved).

Semantic note (SURVEY.md §7 flags this as a trap): the reference's
docstring warns that vorticity(x) "would modify x to the advected
positions", but its rk4 path never does — advection_rk4 writes a fresh
goal_pos tensor (2D/GSR.py:583-592), so the projection's data loss is
evaluated at the ORIGINAL sample positions against targets from the
backtraced ones. These functions are pure and implement exactly that.

3D (reference 3D/advance.py:11-49): additionally pull the vorticity back
through the inverse deformation, omega = (dpsi)^{-1} omega_b, and form the
helicity target hel = v_b . omega_b.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
import os

from gaussian_fluids_tpu.ops.advect import (rk4_deformation_stages,
                                            rk4_pos_stages)
from gaussian_fluids_tpu.solver import losses


def _finish_2d(bk_x: jnp.ndarray, dv: jnp.ndarray, adv_lo,
               adv_hi) -> jnp.ndarray:
    """THE single copy of the 2D covector finish (reference
    2D/advance.py:46-54): curl at the backtraced points, zeroed where the
    backtrace left [adv_lo, adv_hi] (2D vorticity is materially
    conserved). Shared by the staged, fused-RK4 and rk1 backtrace paths."""
    vor = losses.curl2d(dv)
    lo = jnp.asarray(adv_lo, jnp.float32)
    hi = jnp.asarray(adv_hi, jnp.float32)
    inside = jnp.all((bk_x >= lo) & (bk_x <= hi), axis=-1)
    return jnp.where(inside, vor, 0.0)


def vorticity_target_2d_from(fval, fjac, x: jnp.ndarray, dt, adv_lo,
                             adv_hi) -> jnp.ndarray:
    """2D covector target through arbitrary closures: RK4-backtrace x
    through ``fval(points) -> velocities`` by -dt, then the shared finish
    on ``fjac(points) -> jacobians`` at the endpoint. The single-device
    and sharded projection paths both build on it."""
    bk_x = rk4_pos_stages(fval, x, -dt)
    return _finish_2d(bk_x, fjac(bk_x), adv_lo, adv_hi)


def advected_vorticity_2d(vel_mix: GaussianMixture, spec: FieldSpec,
                          x: jnp.ndarray, dt, adv_lo, adv_hi,
                          presorted: bool = False) -> jnp.ndarray:
    """Target vorticity at x (B,) — reference AdvectedCovectorField.vorticity
    with the 'rk4' scheme (2D/advance.py:46-54). adv_lo/adv_hi are the
    *scaled* advance-domain bounds."""
    from gaussian_fluids_tpu.ops import field
    # GF_FUSED_RK4=1 runs the single-launch fused kernel; measured slightly
    # SLOWER than the staged culled launches at production scales (586 vs
    # 595 us/epoch at leapfrog, 2157 vs 2200 at karman: the staged path's
    # block-sparse tile mask outweighs the launch fusion), so default off.
    if field._use_pallas(x.shape[0], vel_mix.capacity) and \
            os.environ.get("GF_FUSED_RK4", "0") == "1":
        bk_x, _, dv = field.rk4_valjac_fused(vel_mix, spec, x, -dt)
        return _finish_2d(bk_x, dv, adv_lo, adv_hi)
    return vorticity_target_2d_from(
        lambda p: field.value(vel_mix, spec, p, presorted=presorted,
                              need_dx=False),
        lambda p: field.value_and_jac(vel_mix, spec, p, presorted=presorted,
                                      need_dx=False)[1],
        x, dt, adv_lo, adv_hi)


def advected_vorticity_2d_rk1(vel_mix: GaussianMixture, spec: FieldSpec,
                              x: jnp.ndarray, dt, adv_lo,
                              adv_hi) -> jnp.ndarray:
    """The reference's alternative 'rk1-backtrace' scheme (unused by
    default, 2D/advance.py:34-44): single-step backtrace x - u(x) dt."""
    from gaussian_fluids_tpu.ops import field
    v = field.value(vel_mix, spec, x, need_dx=False)
    bk_x = x - v * dt
    _, dv = field.value_and_jac(vel_mix, spec, bk_x)
    return _finish_2d(bk_x, dv, adv_lo, adv_hi)


def covector_targets_3d_from(f, x: jnp.ndarray, dt):
    """THE single copy of the 3D covector finish (reference
    3D/advance.py:34-47): RK4 deformation backtrace through an arbitrary
    ``f(points) -> (velocities, jacobians)`` closure, then the vorticity
    pullback omega = (dpsi)^{-1} omega_b and helicity hel = v_b . omega_b.
    The single-device and sharded projection paths both build on it."""
    _, dpsi, pb_v, pb_dv = rk4_deformation_stages(f, x, -dt)
    pb_vor = losses.curl3d(pb_dv)
    hel = jnp.sum(pb_v * pb_vor, axis=-1)
    vor = jnp.linalg.solve(dpsi, pb_vor[..., None])[..., 0]
    return vor, hel


def advected_vorticity_3d(vel_mix: GaussianMixture, spec: FieldSpec,
                          x: jnp.ndarray, dt, presorted: bool = False):
    """(vor (B,3), hel (B,)) — reference 3D/advance.py:34-47."""
    from gaussian_fluids_tpu.ops import field
    return covector_targets_3d_from(
        lambda p: field.value_and_jac(vel_mix, spec, p,
                                      presorted=presorted, need_dx=False),
        x, dt)
