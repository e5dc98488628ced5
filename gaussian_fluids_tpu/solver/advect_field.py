"""Covector advection: move Gaussian centres through the flow.

2D (reference 2D/advance.py:160-185): RK4 through the field's *own*
velocity, drop Gaussians leaving the padded domain (N shrinks — handled by
the alive mask + host-side repack).

3D (reference 3D/advance.py:167-180): RK4 through the *old* velocity field,
clamp to the padded domain (N unchanged).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops.advect import rk4_advect


def advect_covector_field_2d(mix: GaussianMixture, spec: FieldSpec,
                             dt: float,
                             advection_scheme: str = "rk4"
                             ) -> GaussianMixture:
    if advection_scheme == "rk1-backtrace":
        from gaussian_fluids_tpu.ops import field
        new_pos = mix.positions + dt * field.value(mix, spec, mix.positions)
    elif advection_scheme == "rk4":
        new_pos = rk4_advect(mix, spec, mix.positions, dt)
    else:
        raise NotImplementedError(advection_scheme)
    lo = np.asarray(spec.lo, np.float32)
    hi = np.asarray(spec.hi, np.float32)
    pos = np.asarray(new_pos)
    alive = np.asarray(mix.alive)
    valid = alive & np.all((pos >= lo) & (pos <= hi), axis=-1)
    return GaussianMixture.from_arrays(
        pos[valid], np.asarray(mix.scalings)[valid],
        np.asarray(mix.rotations)[valid], np.asarray(mix.values)[valid],
        spec, min_capacity=mix.capacity).spatially_sorted()


def advect_covector_field_3d(mix: GaussianMixture,
                             vel_mix: GaussianMixture, spec: FieldSpec,
                             dt: float) -> GaussianMixture:
    new_pos = rk4_advect(vel_mix, spec, mix.positions, dt)
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    new_pos = jnp.clip(new_pos, lo, hi)
    # keep padded entries parked at spec.lo
    new_pos = jnp.where(mix.alive[:, None], new_pos, lo)
    # re-sort by coordinate 0 so the block-sparse field backend's tile
    # bounding boxes stay tight (order is semantically irrelevant)
    return GaussianMixture(new_pos, mix.scalings, mix.rotations, mix.values,
                           mix.alive).spatially_sorted()
