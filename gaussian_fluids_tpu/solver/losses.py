"""Loss functions.

Pure-jnp losses whose JAX gradients reproduce the reference's hand-derived
Taichi backward kernels exactly:

  value L1      weight/(vdim*m) * sign      == reference 2D/GSR.py:306 (w/(2m))
  gradient L1   weight/(vdim*d*m) * sign    == reference 2D/GSR.py:424 (w/(4m))
  vorticity L1  weight/m * sign (2D scalar) == reference 2D/GSR.py:427
                weight/(3m) per comp (3D)   == reference 3D/GSR.py:456
  divergence L2 weight/m * 2*div            == reference 2D/GSR.py:430
  helicity L1   weight/m * sign             == reference 3D/GSR.py:490
  boundary      weight/m * sign(val.n - r)  == reference 2D/GSR.py:302-308
  free-slip 3D  weight/m * sign(val.n)      == reference 3D/GSR.py:414-433

Per-Gaussian freezing (``stop_gradient`` mask, reference 2D/GSR.py:291-292)
is applied by stop-gradient-ing frozen rows of the parameters before the
field evaluation.

All reductions respect the ``alive`` padding mask where they range over
Gaussians (regularizers); data-term losses are means over the query batch
exactly as in the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

ANISO_RATIO = 1.5  # reference 2D/advance.py:108, 3D/advance.py:107


def freeze_params(params: Params, stop_mask: jnp.ndarray) -> Params:
    """Rows where stop_mask is True receive no gradient (reference
    'stop_gradient' kernel skip, 2D/GSR.py:291-292)."""
    def f(p):
        m = stop_mask.reshape((-1,) + (1,) * (p.ndim - 1))
        return jnp.where(m, jax.lax.stop_gradient(p), p)
    return {k: f(v) for k, v in params.items()}


# ---- data terms (given field outputs) ----

def l1(a, b):
    return jnp.abs(a - b).mean()


def value_loss(val, ref_val):
    """F.l1_loss(val, ref) (reference 2D/advance.py:105)."""
    return l1(val, ref_val)


def grad_loss(jac, ref_jac):
    """F.l1_loss(grad, ref_grad) (reference 2D/advance.py:106)."""
    return l1(jac, ref_jac)


def curl2d(jac):
    return jac[:, 1, 0] - jac[:, 0, 1]


def curl3d(jac):
    return jnp.stack([
        jac[:, 2, 1] - jac[:, 1, 2],
        jac[:, 0, 2] - jac[:, 2, 0],
        jac[:, 1, 0] - jac[:, 0, 1],
    ], axis=-1)


def divergence(jac):
    return jnp.trace(jac, axis1=-2, axis2=-1)


def vorticity_loss_2d(jac, ref_vor):
    """mean |curl u - ref| (reference 2D/advance.py:247)."""
    return jnp.abs(curl2d(jac) - ref_vor).mean()


def vorticity_loss_3d(jac, ref_vor):
    """mean |curl u - ref| over (Q, 3) (reference 3D/advance.py:232)."""
    return jnp.abs(curl3d(jac) - ref_vor).mean()


def divergence_loss(jac):
    """mean (div u)^2 (reference 2D/advance.py:248, 3D/advance.py:235)."""
    return (divergence(jac) ** 2).mean()


def helicity_loss(val, jac, ref_hel):
    """mean |u . curl u - ref_hel| (reference 3D/advance.py:233)."""
    hel = jnp.sum(val * curl3d(jac), axis=-1)
    return jnp.abs(hel - ref_hel).mean()


def boundary_dirichlet_loss(val, ref_val):
    """Type-1 boundary: L1 of value against target velocity (reference
    2D/advance.py:218-220)."""
    return l1(val, ref_val)


def boundary_flux_loss(val, normals, normal_ref):
    """Type-2 boundary: L1 of the normal flux against target (reference
    2D/advance.py:231-235)."""
    flux = jnp.sum(val * normals, axis=-1)
    return jnp.abs(flux - normal_ref).mean()


def boundary_freeslip_loss(val, normals):
    """3D free-slip: mean |u . n| (reference 3D/advance.py:247-253)."""
    return jnp.abs(jnp.sum(val * normals, axis=-1)).mean()


# ---- regularizers over Gaussian parameters ----

def _masked_mean(x, mask):
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, x, 0.0).sum() / denom


def aniso_loss(scalings, mask):
    """mean(max(ratio, r0) - r0) with ratio = exp(s_max - s_min), over
    `mask` (alive, and in clone only the non-frozen — reference
    2D/advance.py:108-112). If the mask is empty the reference substitutes
    ratio = 1, giving loss 0."""
    ratio = jnp.exp(scalings.max(axis=-1) - scalings.min(axis=-1))
    per = jnp.maximum(ratio, ANISO_RATIO) - ANISO_RATIO
    return _masked_mean(per, mask)


def volume_loss(scalings, alive, detach_mask=None):
    """mean((vol/mean(vol) - 1)^2), vol = exp(-sum s); in clone the frozen
    Gaussians' volumes are detached but still enter the mean (reference
    2D/advance.py:113-116)."""
    if detach_mask is not None:
        s = jnp.where(detach_mask[:, None], jax.lax.stop_gradient(scalings),
                      scalings)
    else:
        s = scalings
    vol = jnp.exp(-s.sum(axis=-1))
    mean_vol = _masked_mean(vol, alive)
    per = (vol / mean_vol - 1.0) ** 2
    return _masked_mean(per, alive)


def delta_pos_loss(positions, positions_org, alive):
    """F.mse_loss(positions, positions_org) (reference 2D/advance.py:255)."""
    per = ((positions - positions_org) ** 2).mean(axis=-1)
    return _masked_mean(per, alive)


def value_reg_loss(values, alive):
    """values.abs().mean() (reference 3D/advance.py:242)."""
    per = jnp.abs(values).mean(axis=-1)
    return _masked_mean(per, alive)


# ---- PCGrad conflict-free gradient combination ----

def pcgrad_combine(g1: Params, g2: Params) -> Params:
    """Per-param-group conflict projection then sum (reference
    `gradient_project`, 2D/advance.py:188-193; inlined 4x in
    3D/advance.py:202-225): if <g1, g2> < 0, project each out of the
    other's (original) direction."""
    out = {}
    for k in g1:
        a, b = g1[k], g2[k]
        dot = jnp.vdot(a, b)
        na = a / jnp.maximum(jnp.linalg.norm(a), 1e-30)
        nb = b / jnp.maximum(jnp.linalg.norm(b), 1e-30)
        a2 = a - jnp.vdot(a, nb) * nb
        b2 = b - jnp.vdot(b, na) * na
        conflict = dot < 0.0
        out[k] = jnp.where(conflict, a2 + b2, a + b)
    return out
