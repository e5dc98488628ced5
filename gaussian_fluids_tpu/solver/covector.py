"""Advected covector-field targets: the vorticity (and helicity) the new
field must match after one transport step.

2D (reference 2D/advance.py:9-56): backtrace x through the old velocity by
-dt with RK4; the target vorticity at x is curl u_old at the backtraced
point, zeroed where the backtrace leaves the advance domain (2D vorticity
is materially conserved).

3D (reference 3D/advance.py:11-49): additionally pull the vorticity back
through the inverse deformation, omega = (dpsi)^{-1} omega_b, and form the
helicity target hel = v_b . omega_b.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
import os

from gaussian_fluids_tpu.ops.advect import rk4_advect, rk4_advect_pos
from gaussian_fluids_tpu.solver import losses


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
    else:
        bk_x = rk4_advect_pos(vel_mix, spec, x, -dt, presorted=presorted)
        _, dv = field.value_and_jac(vel_mix, spec, bk_x,
                                    presorted=presorted, need_dx=False)
    vor = losses.curl2d(dv)
    lo = jnp.asarray(adv_lo, jnp.float32)
    hi = jnp.asarray(adv_hi, jnp.float32)
    inside = jnp.all((bk_x >= lo) & (bk_x <= hi), axis=-1)
    return jnp.where(inside, vor, 0.0)


def advected_vorticity_2d_rk1(vel_mix: GaussianMixture, spec: FieldSpec,
                              x: jnp.ndarray, dt, adv_lo,
                              adv_hi) -> jnp.ndarray:
    """The reference's alternative 'rk1-backtrace' scheme (unused by
    default, 2D/advance.py:34-44): single-step backtrace x - u(x) dt."""
    from gaussian_fluids_tpu.ops import field
    v = field.value(vel_mix, spec, x, need_dx=False)
    bk_x = x - v * dt
    _, dv = field.value_and_jac(vel_mix, spec, bk_x)
    vor = losses.curl2d(dv)
    lo = jnp.asarray(adv_lo, jnp.float32)
    hi = jnp.asarray(adv_hi, jnp.float32)
    inside = jnp.all((bk_x >= lo) & (bk_x <= hi), axis=-1)
    return jnp.where(inside, vor, 0.0)


def advected_vorticity_3d(vel_mix: GaussianMixture, spec: FieldSpec,
                          x: jnp.ndarray, dt, presorted: bool = False):
    """(vor (B,3), hel (B,)) — reference 3D/advance.py:34-47."""
    bk_x, dpsi, pb_v, pb_dv = rk4_advect(vel_mix, spec, x, -dt,
                                         with_deformation=True,
                                         presorted=presorted)
    pb_vor = losses.curl3d(pb_dv)
    hel = jnp.sum(pb_v * pb_vor, axis=-1)
    vor = jnp.linalg.solve(dpsi, pb_vor[..., None])[..., 0]
    return vor, hel
