"""Field evaluation: value and spatial Jacobian of the Gaussian mixture.

Semantics (the "fast path" of the reference, which is the spec — see
reference 2D/GSR.py:269-281, 3D/GSR.py:277-298):

    g_i(x)   = exp(-1/2 (x - mu_i)^T Sigma_i^{-1} (x - mu_i))
    u(x)     = sum_i  1[g_i >= c] * 1[mu_i in padded domain] * v_i (g_i - c)
    du/dx    = sum_i  1[...] * v_i (-g_i) (Sigma_i^{-1} (x - mu_i))^T

The in-domain indicator mirrors the reference dropping out-of-domain
Gaussians from the acceleration grid (reference 2D/GSR.py:199-200). The
clamp indicator with the reference's dynamic search radius makes the culled
evaluation *exactly* equal to this dense masked sum, so the dense form is
both the correctness oracle and a legitimate backend.

TPU mapping: the quadratic form is evaluated as one (B, F) @ (F, N) matmul
over polynomial features of x — F = d(d+3)/2 + 1 (6 in 2D, 10 in 3D) — and
the value / Jacobian contractions are (B, N) @ (N, ·) matmuls. Everything
lands on the MXU; the only O(B*N) temporary is the masked kernel matrix.
Parameter gradients come from JAX AD (deterministic, no atomics — replaces
the reference's hand-derived scatter kernels, 2D/GSR.py:284-476).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture

_MM = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def in_domain_mask(mix: GaussianMixture, spec: FieldSpec) -> jnp.ndarray:
    """(N,) bool: alive and centre inside the padded domain."""
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    inside = jnp.all((mix.positions >= lo) & (mix.positions <= hi), axis=-1)
    return mix.alive & inside


def _quad_features(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Polynomial features of query points for the quad-form matmul.

    quad(x; P, pm, c0) = x^T P x - 2 x . pm + c0 is linear in
    [x_i^2, 2 x_i x_j (i<j), -2 x_i, 1].
    """
    cols = [x[:, i] * x[:, i] for i in range(d)]
    for i in range(d):
        for j in range(i + 1, d):
            cols.append(2.0 * x[:, i] * x[:, j])
    for i in range(d):
        cols.append(-2.0 * x[:, i])
    cols.append(jnp.ones_like(x[:, 0]))
    return jnp.stack(cols, axis=-1)


def _quad_weights(mix: GaussianMixture) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray]:
    """Per-Gaussian weights matching `_quad_features` + (P, pm) for the jac.

    Returns (W, P, pm): W (N, F), P = Sigma^{-1} (N, d, d), pm = P mu (N, d).
    """
    d = mix.d
    P = mix.precisions()
    pm = jnp.einsum("nij,nj->ni", P, mix.positions)
    c0 = jnp.einsum("ni,ni->n", pm, mix.positions)
    cols = [P[:, i, i] for i in range(d)]
    for i in range(d):
        for j in range(i + 1, d):
            cols.append(P[:, i, j])
    for i in range(d):
        cols.append(pm[:, i])
    cols.append(c0)
    return jnp.stack(cols, axis=-1), P, pm


def masked_kernel(mix: GaussianMixture, spec: FieldSpec,
                  x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray, jnp.ndarray]:
    """Returns (mg, mask, P, pm): masked Gaussian kernel matrix (B, N) with
    entries g_i(x_b) where the compact-support + domain mask holds, else 0."""
    if x.ndim != 2 or x.shape[1] != mix.d:
        raise ValueError(
            f"query points must have shape (B, {mix.d}); got {x.shape}")
    W, P, pm = _quad_weights(mix)
    feat = _quad_features(x, mix.d)                      # (B, F)
    quad = _MM(feat, W.T)                                # (B, N) on the MXU
    g = jnp.exp(-0.5 * quad)
    mask = (g >= spec.clamp_threshold) & in_domain_mask(mix, spec)[None, :]
    return jnp.where(mask, g, 0.0), mask, P, pm


def value(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """u(x): (B, vdim). Fast-path semantics: sum of v_i (g_i - c) over the
    support (reference 2D/GSR.py:279-281)."""
    mg, mask, _, _ = masked_kernel(mix, spec, x)
    mg_val = jnp.where(mask, mg - spec.clamp_threshold, 0.0)
    return _MM(mg_val, mix.values)


def value_and_jac(mix: GaussianMixture, spec: FieldSpec,
                  x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(u(x), du/dx): shapes (B, vdim) and (B, vdim, d).

    jac[b,a,k] = -sum_n mg[b,n] v[n,a] (P[n] x[b] - pm[n])[k], evaluated as
    two (B, N) @ (N, *) matmuls to avoid any (B, N, d) temporary.
    """
    d, vdim = mix.d, mix.vdim
    mg, mask, P, pm = masked_kernel(mix, spec, x)
    mg_val = jnp.where(mask, mg - spec.clamp_threshold, 0.0)
    val = _MM(mg_val, mix.values)

    vP = jnp.einsum("na,nkj->nakj", mix.values, P).reshape(-1, vdim * d * d)
    vpm = jnp.einsum("na,nk->nak", mix.values, pm).reshape(-1, vdim * d)
    t1 = _MM(mg, vP).reshape(-1, vdim, d, d)             # (B, vdim, d, d)
    t2 = _MM(mg, vpm).reshape(-1, vdim, d)               # (B, vdim, d)
    jac = -(jnp.einsum("bakj,bj->bak", t1, x) - t2)
    return val, jac


def jacobian(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    return value_and_jac(mix, spec, x)[1]


def coverage(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """sum_i (g_i - c) over the support — density-of-coverage diagnostic
    (reference 2D/GSR.py:594-618)."""
    mg, mask, _, _ = masked_kernel(mix, spec, x)
    return jnp.sum(jnp.where(mask, mg - spec.clamp_threshold, 0.0), axis=-1)


def neighbor_mark(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                  radius: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool: Gaussians within `radius` of any query point (reference
    get_all_neighbors, 2D/GSR.py:620-635). Dense pairwise distances; the
    query set (freshly split Gaussians) is small."""
    d2 = jnp.sum(
        (x[:, None, :] - mix.positions[None, :, :]) ** 2, axis=-1)
    near = jnp.any(d2 <= radius * radius, axis=0)
    return near & in_domain_mask(mix, spec)


# ---- chunked (memory-bounded) evaluation for big query sets ----

def value_and_jac_chunked(mix: GaussianMixture, spec: FieldSpec,
                          x: jnp.ndarray, chunk: int = 4096):
    """Evaluate on large grids (test/visualisation) in fixed-size chunks via
    lax.map; pads the tail. No gradients flow through this path."""
    b = x.shape[0]
    nchunk = -(-b // chunk)
    xp = jnp.zeros((nchunk * chunk, x.shape[1]), x.dtype).at[:b].set(x)
    xs = xp.reshape(nchunk, chunk, x.shape[1])
    f = lambda xc: value_and_jac(mix, spec, xc)
    vals, jacs = jax.lax.map(f, xs)
    return (vals.reshape(nchunk * chunk, -1)[:b],
            jacs.reshape(nchunk * chunk, mix.vdim, mix.d)[:b])


# ---- dense reference (oracle) path, no clamp subtraction ----

def value_dense_oracle(mix: GaussianMixture, spec: FieldSpec,
                       x: jnp.ndarray) -> jnp.ndarray:
    """The reference's *slow* dense path (no clamp truncation, reference
    2D/GSR.py:110-121) — kept as a differential-testing oracle."""
    P = mix.precisions()
    delta = x[:, None, :] - mix.positions[None, :, :]
    quad = jnp.einsum("bni,nij,bnj->bn", delta, P, delta)
    g = jnp.exp(-0.5 * quad) * mix.alive[None, :]
    return _MM(g, mix.values)
