"""Gaussian-importance collocation samplers.

The reference defines (but never wires up) two importance samplers that
draw training collocation points from the mixture's own Gaussians instead
of uniformly over the domain (reference 3D/advance.py:343-363:
``generate_gaussians`` picks n random Gaussians and samples each pick's
own ``MultivariateNormal(mu, precision)``; ``generate_all_gaussians``
draws one sample per Gaussian). Both clamp to the advance domain. They are
kept here for component parity and as a useful densification tool.

Sampling uses the closed-form square root of the covariance instead of a
Cholesky solve: with precision P = R diag(e^{2s}) R^T (ops/rotations.py),
the covariance is Sigma = R diag(e^{-2s}) R^T, so
x = mu + R diag(e^{-s}) z with z ~ N(0, I) is an exact sample.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops.rotations import rotation_matrix

__all__ = ["generate_gaussians", "generate_all_gaussians"]


def _domain_lo_hi(domain, d: int):
    dom = jnp.asarray(domain, jnp.float32)
    if dom.shape[0] != 2 * d:
        raise ValueError(f"domain needs {2 * d} bounds, got {dom.shape[0]}")
    return dom[0::2], dom[1::2]


def _sample_from(mix: GaussianMixture, d: int, pick: jnp.ndarray,
                 z: jnp.ndarray) -> jnp.ndarray:
    rot = rotation_matrix(mix.rotations[pick], d)
    half = rot * jnp.exp(-mix.scalings[pick])[:, None, :]  # R @ diag(e^-s)
    return mix.positions[pick] + jnp.einsum("nij,nj->ni", half, z)


def generate_gaussians(key, mix: GaussianMixture, spec: FieldSpec, domain,
                       n: int,
                       restrict: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """n collocation points from randomly picked (alive, restrict-allowed)
    Gaussians' own distributions, clamped to ``domain`` (reference
    3D/advance.py:344-356). ``domain`` is (x_min, x_max, y_min, y_max[,
    z_min, z_max]). Works for d=2 and d=3."""
    d = spec.d
    lo, hi = _domain_lo_hi(domain, d)
    ok = mix.alive if restrict is None else jnp.logical_and(
        mix.alive, restrict)
    kp, kz, ku = jax.random.split(key, 3)
    logits = jnp.where(ok, 0.0, -jnp.inf)
    pick = jax.random.categorical(kp, logits, shape=(n,))
    z = jax.random.normal(kz, (n, d), jnp.float32)
    samp = jnp.clip(_sample_from(mix, d, pick, z), lo, hi)
    # all logits -inf (no alive/allowed Gaussian) degenerates categorical
    # to index 0 — a dead slot's stale state. Fall back to uniform domain
    # samples instead of returning plausible-looking garbage.
    fill = jax.random.uniform(ku, (n, d), jnp.float32) * (hi - lo) + lo
    return jnp.where(jnp.any(ok), samp, fill)


def generate_all_gaussians(key, mix: GaussianMixture, spec: FieldSpec,
                           domain) -> jnp.ndarray:
    """One sample per Gaussian, clamped to the domain (reference
    3D/advance.py:357-363). Rows belonging to padding (dead) slots are
    replaced by uniform domain samples so every returned point is a valid
    collocation point at the mixture's static capacity."""
    d = spec.d
    lo, hi = _domain_lo_hi(domain, d)
    cap = mix.positions.shape[0]
    kz, ku = jax.random.split(key)
    z = jax.random.normal(kz, (cap, d), jnp.float32)
    samp = jnp.clip(_sample_from(mix, d, jnp.arange(cap), z), lo, hi)
    fill = jax.random.uniform(ku, (cap, d), jnp.float32) * (hi - lo) + lo
    return jnp.where(mix.alive[:, None], samp, fill)
