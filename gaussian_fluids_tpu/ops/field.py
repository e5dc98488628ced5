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

TPU mapping: two backends behind `value` / `value_and_jac` (auto-dispatch
on B*N, GF_FIELD_BACKEND overrides):
  * dense — the quadratic form as one (B, F) @ (F, N) matmul over
    polynomial features of x plus (B, N) @ (N, ·) contractions, all on the
    MXU; the only O(B*N) temporary is the masked kernel matrix. The
    correctness oracle and small-problem path.
  * centered block-sparse Pallas (ops/pallas/gsr_centered.py, see
    docs/KERNELS.md) — the production path at scale: coordinate-sorted
    tiles, an exact bbox+support-radius tile mask, cancellation-free VPU
    quad form, direct Jacobian contraction; the kernel matrix never leaves
    VMEM.
Parameter gradients come from JAX AD (deterministic, no atomics — replaces
the reference's hand-derived scatter kernels, 2D/GSR.py:284-476), with a
flash-style custom VJP on the Pallas path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import rotations as rotations_ops

_MM = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

# Hot-path backend selection: "auto" (fused Pallas kernel on TPU when the
# (B, N) sweep is large enough to pay off, dense XLA otherwise), "dense", or
# "pallas" via GF_FIELD_BACKEND. The Pallas path is bit-compatible in
# masking semantics and measured faster at EVERY production epoch scale
# (scripts/bench_backend_crossover.py, in-scan interleaved timing on v5e:
# 11% at N=576/B=512 up to 33% at N=10k, 1.2-2.5x at karman/3D scales);
# dense remains for sub-tile query batches (padding waste) and CPU, where
# Pallas interpret mode is slow.
_BACKEND_ENV = "GF_FIELD_BACKEND"
_PALLAS_MIN_BN = 262_144  # B*N above which the fused kernel wins on TPU
_PALLAS_MIN_B = 256       # below one query tile, tb-padding favors dense


def _use_pallas(b: int, n: int) -> bool:
    mode = os.environ.get(_BACKEND_ENV, "auto")
    if mode in ("dense", "sparse"):
        return False
    if mode == "pallas":
        return True
    return (jax.default_backend() in ("tpu", "axon")
            and b >= _PALLAS_MIN_B and b * n >= _PALLAS_MIN_BN)


def _use_sparse(b: int, n: int, d: int) -> bool:
    """Cell-list COO backend (ops/sparse.py): opt-in via
    GF_FIELD_BACKEND=sparse only. Permanently outside the auto ladder:
    compile cost disqualified it on the chip (r3) and the round-4
    experiments settled the production answer on the work-list cells
    backend (BASELINE.md); it remains the exact reference-culling
    oracle on CPU."""
    return os.environ.get(_BACKEND_ENV, "auto") == "sparse"


# Work-list (cells) Pallas backend (ops/pallas/gsr_cells.py): the coarse
# tile mask compacted into a flat list of live tile pairs, so the kernel
# grid walks ONLY those — a masked sweep with zero skipped steps. On-chip
# A/B at ring_collide production scale (frame-20 checkpoint, x-sorted,
# 256x512 tiles, density 0.13): fwd 3.52 -> 2.07 ms, dual-backward 7.55
# -> 5.73 ms. FINE tiles (Morton-sorted 8-32 x 128-256) are a measured
# negative: 0.4-1 us fixed cost per grid step swamps the ~2x pair
# reduction (fwd 11-16 ms, bwd 25-39 ms) — see ops/spatial.sort_key.
_CELLS_MIN_BN = 1 << 26   # ~8192 x 8192: below this, list prep outweighs


def _use_cells(b: int, n: int, d: int) -> bool:
    mode = os.environ.get(_BACKEND_ENV, "auto")
    if mode == "cells":
        return True
    if mode != "auto":
        return False
    return (d == 3 and jax.default_backend() in ("tpu", "axon")
            and b >= _PALLAS_MIN_B and b * n >= _CELLS_MIN_BN
            and os.environ.get("GF_CELLS", "1") == "1")


def _cells_tiles(d: int):
    tb = int(os.environ.get("GF_CELLS_TB", "256"))
    tn = int(os.environ.get("GF_CELLS_TN", "512"))
    # the coarse overflow fallback runs at (max(tb,256), max(tn,512)) and
    # _coarsen_mask OR-pools the fine mask into it, so the fine tile must
    # divide the coarse one; a non-divisor would otherwise surface as an
    # opaque reshape error at trace time (ADVICE r4)
    tbc = max(tb, _CELLS_FALLBACK_TB)
    tnc = max(tn, _CELLS_FALLBACK_TN)
    if tbc % tb or tnc % tn:
        raise ValueError(
            f"GF_CELLS_TB={tb} must divide {tbc} and GF_CELLS_TN={tn} "
            f"must divide {tnc} (the coarse fallback tiling)")
    return tb, tn


def _cells_cap(nbt: int, nnt: int) -> int:
    """Static work-list capacity: a density-fraction budget over the full
    tile grid plus the keep-alive floor. Too small is SAFE (the overflow
    flag falls back to the full masked sweep) but slow if chronic; too
    big wastes dead grid steps. At the coarse default tiling the observed
    production density is ~0.13 (BASELINE.md), so 0.3 gives >2x headroom
    for a few hundred wasted (cheap) steps."""
    frac = float(os.environ.get("GF_CELLS_CAP", "0.3"))
    return int(frac * nbt * nnt) + max(nbt, nnt)


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


def value(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
          presorted: bool = False, need_dx: bool = True) -> jnp.ndarray:
    """u(x): (B, vdim). Fast-path semantics: sum of v_i (g_i - c) over the
    support (reference 2D/GSR.py:279-281). Dispatches to the fused Pallas
    kernel on TPU (GF_FIELD_BACKEND overrides). ``presorted`` promises x is
    ascending in coordinate 0 (skips the internal sort; an untrue promise
    only loosens tile bounds, never correctness)."""
    if _use_sparse(x.shape[0], mix.capacity, mix.d):
        from gaussian_fluids_tpu.ops import sparse as sparse_ops
        return sparse_ops.value_sparse(mix, spec, x)
    if not need_dx and _use_cells(x.shape[0], mix.capacity, mix.d):
        return _cells_value_jac(mix, spec, x, 0, presorted=presorted)[0]
    if _use_pallas(x.shape[0], mix.capacity):
        return value_centered(mix, spec, x, presorted=presorted,
                              need_dx=need_dx)
    return value_dense(mix, spec, x)


def value_dense(mix: GaussianMixture, spec: FieldSpec,
                x: jnp.ndarray) -> jnp.ndarray:
    mg, mask, _, _ = masked_kernel(mix, spec, x)
    mg_val = jnp.where(mask, mg - spec.clamp_threshold, 0.0)
    return _MM(mg_val, mix.values)


def value_and_jac(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                  presorted: bool = False, need_dx: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(u(x), du/dx): shapes (B, vdim) and (B, vdim, d). Dispatches to the
    fused Pallas kernel on TPU (GF_FIELD_BACKEND overrides). ``presorted``
    as in ``value``."""
    if _use_sparse(x.shape[0], mix.capacity, mix.d):
        from gaussian_fluids_tpu.ops import sparse as sparse_ops
        return sparse_ops.value_and_jac_sparse(mix, spec, x)
    if not need_dx and _use_cells(x.shape[0], mix.capacity, mix.d):
        return _cells_value_jac(mix, spec, x, mix.d, presorted=presorted)
    if _use_pallas(x.shape[0], mix.capacity):
        return value_and_jac_centered(mix, spec, x, presorted=presorted,
                                      need_dx=need_dx)
    return value_and_jac_dense(mix, spec, x)


def value_and_jac_dense(mix: GaussianMixture, spec: FieldSpec,
                        x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense XLA backend.

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


# ---- cached host-side grid evaluation ----
#
# On this image's tunneled TPU runtime, *lowering* a program costs tens of
# seconds; fresh closures (new lax.map lambdas per frame) would re-lower
# every frame. These evaluators are cached per spec and take all data as
# runtime arguments, so visualization/test sweeps lower exactly once.

@functools.lru_cache(maxsize=None)
def _cached_chunk_eval(spec: FieldSpec):
    @jax.jit
    def f(params, alive, x):
        mix = GaussianMixture(params["positions"], params["scalings"],
                              params["rotations"], params["values"], alive)
        return value_and_jac(mix, spec, x)
    return f


def eval_on_grid(mix: GaussianMixture, spec: FieldSpec, pts,
                 chunk: int = 4096):
    """(val, jac) on arbitrarily many points, evaluated in fixed-shape
    jitted chunks (host loop). For viz/test sweeps outside jit."""
    import numpy as np
    f = _cached_chunk_eval(spec)
    pts = np.asarray(pts, np.float32)
    b = pts.shape[0]
    pad = (-b) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, spec.d), np.float32)])
    vals = np.empty((b + pad, mix.vdim), np.float32)
    jacs = np.empty((b + pad, mix.vdim, spec.d), np.float32)
    params = mix.params()
    for i in range(0, b + pad, chunk):
        v, j = f(params, mix.alive, jnp.asarray(pts[i:i + chunk]))
        vals[i:i + chunk] = np.asarray(v)
        jacs[i:i + chunk] = np.asarray(j)
    return vals[:b], jacs[:b]


# ---- fused Pallas path (TPU performance backend) ----

def _pad_axis(a: jnp.ndarray, mult: int, axis: int = 0,
              fill: float = 0.0) -> jnp.ndarray:
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=fill)


def support_radius(scalings: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """(N,) support radius: g >= clamp implies |x - mu| <= this — the
    reference's dynamic search radius sqrt(-2 ln c) e^{-min s}
    (2D/GSR.py:226). Single source of truth for every culling path (tile
    mask, banded window, host-side band sizing): they must all agree or
    the skip guarantee breaks."""
    import math
    return (math.sqrt(-2.0 * math.log(clamp))
            * jnp.exp(-jnp.min(scalings, axis=-1)))


def _packed_precisions(mix: GaussianMixture, dead: jnp.ndarray) -> jnp.ndarray:
    """(N, d(d+1)/2 + 1): P diagonal, P off-diagonals (i<j), dead-row bias.

    Entries come from the closed-form elementwise path (f32 VPU, exact) —
    NOT by slicing ``mix.precisions()``, whose batched einsum rounds
    through the bf16 MXU and lowers to a slow serial slice fusion."""
    pk = rotations_ops.packed_precision_entries(mix.scalings, mix.rotations,
                                                mix.d)
    return jnp.concatenate([pk, jnp.where(dead, 1e9, 0.0)[:, None]],
                           axis=-1)


def _tile_mask(x_p, valid_b, mu_p, dead_n, scalings_p, spec,
               tb: int, tn: int) -> jnp.ndarray:
    """(B//tb, N//tn) i32: 1 where a query tile's bounding box intersects a
    Gaussian tile's bounding box dilated by that tile's largest support
    radius. Exact: every Gaussian with g >= clamp lies within its own
    radius of the query, so skipped tiles cannot contribute (the same
    guarantee as the reference's uniform grid, 2D/GSR.py:224-229)."""
    d = x_p.shape[1]
    nbt, nnt = x_p.shape[0] // tb, mu_p.shape[0] // tn
    xb = x_p.reshape(nbt, tb, d)
    vb = valid_b.reshape(nbt, tb, 1)
    blo = jnp.min(jnp.where(vb, xb, jnp.inf), axis=1)       # (nbt, d)
    bhi = jnp.max(jnp.where(vb, xb, -jnp.inf), axis=1)
    mun = mu_p.reshape(nnt, tn, d)
    dn = dead_n.reshape(nnt, tn, 1)
    rr = support_radius(scalings_p,
                        spec.clamp_threshold).reshape(nnt, tn, 1)
    # dilate each row by ITS OWN radius before the tile reduce — strictly
    # tighter than tile-bbox + tile-max-radius
    nlo = jnp.min(jnp.where(dn, jnp.inf, mun - rr), axis=1)  # (nnt, d)
    nhi = jnp.max(jnp.where(dn, -jnp.inf, mun + rr), axis=1)
    ok = jnp.all(
        (bhi[:, None, :] >= nlo[None, :, :])
        & (blo[:, None, :] <= nhi[None, :, :]), axis=-1)
    return ok.astype(jnp.int32)


def _padded_param_rows(mix: GaussianMixture, spec: FieldSpec, tn: int):
    """(mu_p, pp_p, v_p): tn-padded parameter rows with the dead/padded-row
    +1e9 bias — the single (differentiable) source of the packed-row
    layout consumed by every centered-kernel wrapper and both VJP preps.
    The bias-row position and padding semantics must never drift between
    the forward wrappers and the gradient preps; keep them here only."""
    dead = ~in_domain_mask(mix, spec)
    pp = _packed_precisions(mix, dead)
    mu_p = _pad_axis(mix.positions, tn, axis=0)
    pp_p = _pad_axis(pp, tn, axis=0)
    nb = mix.d * (mix.d + 1) // 2
    pp_p = pp_p.at[mix.capacity:, nb].set(1e9)   # padded rows never fire
    v_p = _pad_axis(mix.values, tn, axis=0)
    return mu_p, pp_p, v_p


def _centered_prep(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                   tb: int, tn: int, presorted: bool):
    """Shared prep for the centered kernel wrappers: optional coordinate
    sort, padding, packed precisions, tile mask. Returns
    (x_p, b, inv | None, mu_p, pp_p, v_p, tmask)."""
    if x.ndim != 2 or x.shape[1] != mix.d:
        raise ValueError(
            f"query points must have shape (B, {mix.d}); got {x.shape}")
    d = mix.d
    b = x.shape[0]
    sparse = os.environ.get("GF_SPARSE", "1") != "0"
    inv = None
    if sparse and not presorted:
        order = jnp.argsort(x[:, 0])
        inv = jnp.argsort(order)
        x = x[order]
    dead = ~in_domain_mask(mix, spec)
    x_p = _pad_axis(x, tb, axis=0)
    bp = x_p.shape[0]
    mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)
    if sparse:
        valid_b = jnp.arange(bp) < b
        dead_n = _pad_axis(dead.astype(jnp.float32), tn, axis=0,
                           fill=1.0) > 0.5
        s_p = _pad_axis(mix.scalings, tn, axis=0)
        tmask = _tile_mask(x_p, valid_b, mu_p, dead_n, s_p, spec, tb, tn)
    else:
        tmask = jnp.ones((bp // tb, mu_p.shape[0] // tn), jnp.int32)
    return x_p, b, inv, mu_p, pp_p, v_p, tmask


def value_and_jac_centered(mix: GaussianMixture, spec: FieldSpec,
                           x: jnp.ndarray, tb: int = 0,
                           tn: int = 512, presorted: bool = False,
                           need_dx: bool = True
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same semantics as ``value_and_jac`` via the centered fused Pallas
    kernel (ops/pallas/gsr_centered.py) — the production TPU path.

    Block sparsity: queries are sorted along coordinate 0 (results are
    unsorted on the way out), and (query-tile x gaussian-tile) pairs whose
    bounding boxes cannot interact are skipped inside the kernel. With the
    mixture also kept approximately coordinate-sorted (the solver re-sorts
    at frame boundaries) the tile mask is a narrow band. Disable with
    GF_SPARSE=0."""
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import fused_gsr_centered
    d, vdim = mix.d, mix.vdim
    # unlike the feature kernel this one keeps ~10 (tb, tn) f32 VPU
    # temporaries live in VMEM; tb=256 x tn=512 uses ~5 MB of the 16 MB
    # scoped limit, tb=1024 overflows it.
    tb = tb or 256
    x_p, b, inv, mu_p, pp_p, v_p, tmask = _centered_prep(
        mix, spec, x, tb, tn, presorted)
    out = fused_gsr_centered(tmask, x_p, mu_p.T, pp_p.T, v_p, d, vdim,
                             float(spec.clamp_threshold), tb, tn, -1,
                             need_dx)[:b]
    val = out[:, :vdim]
    jac = jnp.transpose(out[:, vdim:].reshape(b, d, vdim), (0, 2, 1))
    if inv is not None:
        val = val[inv]
        jac = jac[inv]
    return val, jac


def value_centered(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                   tb: int = 0, tn: int = 512,
                   presorted: bool = False,
                   need_dx: bool = True) -> jnp.ndarray:
    """Value-only variant of ``value_and_jac_centered`` (njac=0): skips the
    Jacobian contractions and their backward cotangents — the boundary-loss
    fast path."""
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import fused_gsr_centered
    d, vdim = mix.d, mix.vdim
    tb = tb or 256
    x_p, b, inv, mu_p, pp_p, v_p, tmask = _centered_prep(
        mix, spec, x, tb, tn, presorted)
    out = fused_gsr_centered(tmask, x_p, mu_p.T, pp_p.T, v_p, d, vdim,
                             float(spec.clamp_threshold), tb, tn, 0,
                             need_dx)[:b]
    val = out[:, :vdim]
    return val[inv] if inv is not None else val


def two_head_grads_centered(params, alive, spec: FieldSpec, x: jnp.ndarray,
                            head1, head2, tb: int = 256, tn: int = 512,
                            heads_use_val: bool = True):
    """((l1, l2), (g1, g2)): two scalar heads of (val, jac) and their
    parameter gradients, sharing ONE forward and ONE dual-cotangent backward
    kernel sweep.

    The PCGrad conflict projection (reference 2D/advance.py:188-193) needs
    the vorticity-head and divergence-head gradients separately; two
    ``jax.vjp`` pullbacks through the Pallas kernel would recompute the tile
    quantities twice. Here the (val, jac)-level cotangents of each head are
    pulled back together by ``fused_gsr_centered_bwd2``, then through the
    cheap O(N) prep (precisions/padding) per head.

    ``x`` must be presorted ascending in coordinate 0 (training epochs sort
    once per batch). ``head{1,2}(val, jac) -> scalar``; gradients w.r.t.
    ``x`` are not produced (x is a constant of the loss in every epoch)."""
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import (
        _fwd, fused_gsr_centered_bwd2)
    d, vdim = spec.d, spec.vdim
    b = x.shape[0]
    clamp = float(spec.clamp_threshold)
    mix_sg = GaussianMixture(*[jax.lax.stop_gradient(params[k]) for k in
                               ("positions", "scalings", "rotations",
                                "values")], alive)
    x_p, _, _, _, _, _, tmask = _centered_prep(mix_sg, spec, x, tb, tn,
                                               presorted=True)

    def prep(p):
        mix = GaussianMixture(p["positions"], p["scalings"],
                              p["rotations"], p["values"], alive)
        mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)
        return mu_p.T, pp_p.T, v_p

    (muT, ppT, v_p), prep_vjp = jax.vjp(prep, params)
    out = _fwd(tmask, x_p, muT, ppT, v_p, d, vdim, clamp, tb, tn, d)[:b]

    def head_on_out(head, o):
        val = o[:, :vdim]
        jac = jnp.transpose(o[:, vdim:].reshape(b, d, vdim), (0, 2, 1))
        return head(val, jac)

    one = jnp.ones(())
    l1, h1_vjp = jax.vjp(functools.partial(head_on_out, head1), out)
    l2, h2_vjp = jax.vjp(functools.partial(head_on_out, head2), out)
    dout1 = _pad_axis(h1_vjp(one)[0], tb, axis=0)
    dout2 = _pad_axis(h2_vjp(one)[0], tb, axis=0)
    t1, t2 = fused_gsr_centered_bwd2(
        tmask, x_p, muT, ppT, v_p, dout1, dout2, d, vdim, clamp, tb, tn,
        use_val=heads_use_val)
    g1 = prep_vjp(t1)[0]
    g2 = prep_vjp(t2)[0]
    return (l1, l2), (g1, g2)


def epoch_heads_grads_centered(params, alive, spec: FieldSpec,
                               x: jnp.ndarray, x_bnd: jnp.ndarray,
                               head1, head2, head_bnd,
                               heads_use_val: bool = True,
                               tb: int = 256, tn: int = 512):
    """((l1, l2, lb), (g1, g2, gb)) for the fused projection-epoch
    geometry: heads 1/2 (the PCGrad buckets) see (val, jac) at the DATA
    rows ``x``; ``head_bnd`` sees the value at the BOUNDARY rows ``x_bnd``.
    ONE forward sweep over the concatenated rows and ONE triple-cotangent
    backward (``fused_gsr_centered_bwd3``) replace the separate boundary
    forward + value-backward launches. Both row segments must be presorted
    in coordinate 0; each is padded to a whole number of query tiles so the
    backward can gate jac blocks to data tiles only.

    MEASURED SLOWER than the separate launches in the production 2D epoch
    (590 vs 570 us at leapfrog scale, 2271 vs 2191 us at karman scale,
    interleaved in-process A/B on a v5e): the concat geometry doubles the
    backward's B-tile sweep and the forward wastes jac columns on the
    boundary rows, which outweighs the saved launches. Kept (with tests)
    as a building block; the project runners use two_head_grads + separate
    boundary evals."""
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import (
        _fwd, fused_gsr_centered_bwd3)
    d, vdim = spec.d, spec.vdim
    bd_n, bb_n = x.shape[0], x_bnd.shape[0]
    clamp = float(spec.clamp_threshold)
    mix_sg = GaussianMixture(*[jax.lax.stop_gradient(params[k]) for k in
                               ("positions", "scalings", "rotations",
                                "values")], alive)
    x_dp = _pad_axis(x, tb, axis=0)
    data_rows = x_dp.shape[0]
    xc = jnp.concatenate([x_dp, x_bnd], axis=0)
    x_p, _, _, _, _, _, tmask = _centered_prep(mix_sg, spec, xc, tb, tn,
                                               presorted=True)

    def prep(p):
        mix = GaussianMixture(p["positions"], p["scalings"],
                              p["rotations"], p["values"], alive)
        mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)
        return mu_p.T, pp_p.T, v_p

    (muT, ppT, v_p), prep_vjp = jax.vjp(prep, params)
    out = _fwd(tmask, x_p, muT, ppT, v_p, d, vdim, clamp, tb, tn, d)
    bp = x_p.shape[0]

    def head_on_out(head, o):
        val = o[:, :vdim]
        jac = jnp.transpose(o[:, vdim:].reshape(bd_n, d, vdim), (0, 2, 1))
        return head(val, jac)

    one = jnp.ones(())
    out_d = out[:bd_n]
    l1, h1_vjp = jax.vjp(functools.partial(head_on_out, head1), out_d)
    l2, h2_vjp = jax.vjp(functools.partial(head_on_out, head2), out_d)
    val_b = out[data_rows:data_rows + bb_n, :vdim]
    lb, hb_vjp = jax.vjp(head_bnd, val_b)
    cols = (1 + d) * vdim
    dout1 = jnp.zeros((bp, cols), jnp.float32).at[:bd_n].set(h1_vjp(one)[0])
    dout2 = jnp.zeros((bp, cols), jnp.float32).at[:bd_n].set(h2_vjp(one)[0])
    dout3 = jnp.zeros((bp, vdim), jnp.float32) \
        .at[data_rows:data_rows + bb_n].set(hb_vjp(one)[0])
    t1, t2, t3 = fused_gsr_centered_bwd3(
        tmask, x_p, muT, ppT, v_p, dout1, dout2, dout3, d, vdim, clamp,
        tb, tn, data_rows, use_val12=heads_use_val)
    g1 = prep_vjp(t1)[0]
    g2 = prep_vjp(t2)[0]
    gb = prep_vjp(t3)[0]
    return (l1, l2, lb), (g1, g2, gb)


def epoch_heads_grads(params, alive, spec: FieldSpec, x: jnp.ndarray,
                      x_bnd: jnp.ndarray, head1, head2, head_bnd,
                      presorted: bool = True, heads_use_val: bool = True):
    """Backend-dispatching :func:`epoch_heads_grads_centered`: dense
    fallback runs the same three heads through jax.vjp with basis
    cotangents (the kernel fusion only pays on the Pallas path)."""
    cap = params["positions"].shape[0]
    if _use_pallas(x.shape[0], cap):
        return epoch_heads_grads_centered(params, alive, spec, x, x_bnd,
                                          head1, head2, head_bnd,
                                          heads_use_val=heads_use_val)

    def heads(p):
        mix = GaussianMixture(p["positions"], p["scalings"],
                              p["rotations"], p["values"], alive)
        val, jac = value_and_jac(mix, spec, x, presorted=presorted,
                                 need_dx=False)
        vb = value(mix, spec, x_bnd, presorted=presorted, need_dx=False)
        return head1(val, jac), head2(val, jac), head_bnd(vb)

    z, o = jnp.zeros(()), jnp.ones(())
    (l1, l2, lb), vjp = jax.vjp(heads, params)
    g1 = vjp((o, z, z))[0]
    g2 = vjp((z, o, z))[0]
    gb = vjp((z, z, o))[0]
    return (l1, l2, lb), (g1, g2, gb)


def two_head_grads(params, alive, spec: FieldSpec, x: jnp.ndarray,
                   head1, head2, presorted: bool = True,
                   heads_use_val: bool = True):
    """Backend-dispatching version of :func:`two_head_grads_centered`:
    falls back to two jax.vjp pullbacks on the dense path (small problems /
    CPU), where the shared-recompute saving does not apply.

    ``heads_use_val=False`` promises NEITHER head reads the value (jac-only
    losses, e.g. 2D vorticity + divergence): the kernel backward skips the
    value-cotangent matmuls. A head that breaks the promise gets silently
    wrong gradients — dispatch decides, not inspection."""
    cap = params["positions"].shape[0]
    if _use_sparse(x.shape[0], cap, spec.d):
        from gaussian_fluids_tpu.ops import sparse as sparse_ops
        return sparse_ops.two_head_grads_sparse(
            params, alive, spec, x, head1, head2,
            heads_use_val=heads_use_val)
    if _use_cells(x.shape[0], cap, spec.d):
        return two_head_grads_cells(params, alive, spec, x, head1, head2,
                                    heads_use_val=heads_use_val)
    if _use_pallas(x.shape[0], cap):
        return two_head_grads_centered(params, alive, spec, x, head1, head2,
                                       heads_use_val=heads_use_val)

    def heads(p):
        mix = GaussianMixture(p["positions"], p["scalings"],
                              p["rotations"], p["values"], alive)
        val, jac = value_and_jac(mix, spec, x, presorted=presorted,
                                 need_dx=False)
        return head1(val, jac), head2(val, jac)

    (l1, l2), vjp = jax.vjp(heads, params)
    g1 = vjp((jnp.ones(()), jnp.zeros(())))[0]
    g2 = vjp((jnp.zeros(()), jnp.ones(())))[0]
    return (l1, l2), (g1, g2)


# ---- work-list (cells) Pallas backend ----
#
# The exact bbox tile mask at the production coarse tiling is compacted
# into flat live-pair work lists (ops/spatial.flat_work_list) and the
# gsr_cells kernels walk only those — a masked sweep with zero skipped
# grid steps (the measured winner; fine/Morton tilings are recorded
# negatives — see ops/spatial.sort_key and BASELINE.md round 4).
# Overflowing the static list capacity falls back to the full masked
# sweep via lax.cond — exactness can never depend on the capacity.


def _cells_lists(tmask: jnp.ndarray, cap: int):
    from gaussian_fluids_tpu.ops import spatial as spatial_ops
    m = tmask.astype(bool)
    rows, cols, okf = spatial_ops.flat_work_list(m, cap)
    gtiles, qtiles, okb = spatial_ops.flat_work_list(m.T, cap)
    return rows, cols, gtiles, qtiles, okf & okb


# Fallback tiling for the cells path's overflow branch. The centered
# kernels scalar-prefetch the WHOLE tile mask into SMEM (1 MB budget): a
# fine-tiling mask like (512, 500) i32 is 1.02 MB and fails Mosaic
# compilation (measured 2026-08-21), so the fallback runs at the proven
# coarse tiling with an OR-coarsened mask — conservative, hence exact.
_CELLS_FALLBACK_TB = 256
_CELLS_FALLBACK_TN = 512


def _coarsen_mask(tmask: jnp.ndarray, kb: int, kn: int) -> jnp.ndarray:
    """OR-pool a (R, C) tile mask by (kb, kn): a coarse pair interacts
    iff any of its fine pairs does. Requires kb | R and kn | C."""
    r, c = tmask.shape
    m = tmask.astype(bool).reshape(r // kb, kb, c // kn, kn)
    return jnp.any(m, axis=(1, 3)).astype(jnp.int32)


def _cells_fwd_dispatch(ok, tmask_c, rows, cols, x, muT, ppT, values, d,
                        vdim, clamp, tb, tn, njac):
    from gaussian_fluids_tpu.ops.pallas import gsr_centered, gsr_cells
    tbc = max(tb, _CELLS_FALLBACK_TB)
    tnc = max(tn, _CELLS_FALLBACK_TN)
    return jax.lax.cond(
        ok,
        lambda: gsr_cells.fused_gsr_cells_fwd(
            rows, cols, x, muT, ppT, values, d, vdim, clamp, tb, tn, njac),
        lambda: gsr_centered._fwd(
            tmask_c, x, muT, ppT, values, d, vdim, clamp, tbc, tnc, njac))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _cells_core(ok, tmask_c, rows, cols, gtiles, qtiles, x, muT, ppT,
                values, d, vdim, clamp, tb, tn, njac):
    """(B, (1+njac)*vdim) field columns over the work list, differentiable
    in (muT, ppT, values) via the work-list dn kernel. x is a constant of
    the loss (training epochs; need_dx callers use the centered path).
    ``tmask_c`` is the coarse fallback mask (see _coarsen_mask)."""
    return _cells_fwd_dispatch(ok, tmask_c, rows, cols, x, muT, ppT,
                               values, d, vdim, clamp, tb, tn, njac)


def _cells_core_fwd(ok, tmask_c, rows, cols, gtiles, qtiles, x, muT, ppT,
                    values, d, vdim, clamp, tb, tn, njac):
    out = _cells_fwd_dispatch(ok, tmask_c, rows, cols, x, muT, ppT,
                              values, d, vdim, clamp, tb, tn, njac)
    return out, (ok, tmask_c, rows, cols, gtiles, qtiles, x, muT, ppT,
                 values)


def _cells_core_bwd(d, vdim, clamp, tb, tn, njac, res, dout):
    from gaussian_fluids_tpu.ops.pallas import gsr_centered, gsr_cells
    ok, tmask_c, rows, cols, gtiles, qtiles, x, muT, ppT, values = res
    tbc = max(tb, _CELLS_FALLBACK_TB)
    tnc = max(tn, _CELLS_FALLBACK_TN)
    dmuT, dppT, dv = jax.lax.cond(
        ok,
        lambda: gsr_cells.fused_gsr_cells_bwd1(
            gtiles, qtiles, x, muT, ppT, values, dout, d, vdim, clamp,
            tb, tn, njac=njac, use_val=True),
        lambda: tuple(gsr_centered._bwd(
            tmask_c, x, muT, ppT, values, dout, d, vdim, clamp, tbc, tnc,
            njac, need_dx=False)[1:]))
    z = jnp.zeros_like
    return (z(ok), z(tmask_c), z(rows), z(cols), z(gtiles), z(qtiles),
            z(x), dmuT, dppT, dv)


_cells_core.defvjp(_cells_core_fwd, _cells_core_bwd)


def _cells_prep(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                tb: int, tn: int):
    """(x_p, b, tmask_c, work lists, ok) for the cells path. ``x`` must be
    presorted by ops.spatial.sort_key (the 3D solver sorts each batch).

    Queries are padded to the COARSE fallback block (so the overflow
    branch can run at the proven 256x512 tiling); Gaussian rows are
    already 512-bucket padded (models/mixture.py PAD_BUCKET), so tn and
    the coarse tn both divide the capacity."""
    if x.ndim != 2 or x.shape[1] != mix.d:
        raise ValueError(
            f"query points must have shape (B, {mix.d}); got {x.shape}")
    tbc = max(tb, _CELLS_FALLBACK_TB)
    tnc = max(tn, _CELLS_FALLBACK_TN)
    mix_sg = GaussianMixture(*[jax.lax.stop_gradient(a) for a in
                               (mix.positions, mix.scalings,
                                mix.rotations, mix.values)], mix.alive)
    b = x.shape[0]
    dead = ~in_domain_mask(mix_sg, spec)
    x_p = _pad_axis(jax.lax.stop_gradient(x), tbc, axis=0)
    bp = x_p.shape[0]
    mu_p, _, _ = _padded_param_rows(mix_sg, spec, tn)
    if mu_p.shape[0] % tnc:
        raise ValueError(
            f"Gaussian rows ({mu_p.shape[0]}) must divide the coarse "
            f"fallback tile {tnc}; capacity should be 512-bucket padded")
    valid_b = jnp.arange(bp) < b
    dead_n = _pad_axis(dead.astype(jnp.float32), tn, axis=0, fill=1.0) > 0.5
    s_p = _pad_axis(mix_sg.scalings, tn, axis=0)
    tmask = _tile_mask(x_p, valid_b, mu_p, dead_n, s_p, spec, tb, tn)
    tmask_c = _coarsen_mask(tmask, tbc // tb, tnc // tn)
    cap = _cells_cap(*tmask.shape)
    rows, cols, gtiles, qtiles, ok = _cells_lists(tmask, cap)
    return x_p, b, tmask_c, rows, cols, gtiles, qtiles, ok


def _cells_value_jac(mix: GaussianMixture, spec: FieldSpec,
                     x: jnp.ndarray, njac: int, presorted: bool = True):
    """(val, jac|None) via the work-list kernels, differentiable in the
    mixture parameters (x treated as constant — need_dx callers go
    centered)."""
    d, vdim = mix.d, mix.vdim
    tb, tn = _cells_tiles(d)
    inv = None
    if not presorted:
        from gaussian_fluids_tpu.ops import spatial as spatial_ops
        x, inv = spatial_ops.sort_queries(x, spec.lo, spec.hi)
    x_p, b, tmask, rows, cols, gtiles, qtiles, ok = _cells_prep(
        mix, spec, x, tb, tn)
    mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)  # differentiable
    out = _cells_core(ok, tmask, rows, cols, gtiles, qtiles, x_p,
                      mu_p.T, pp_p.T, v_p, d, vdim,
                      float(spec.clamp_threshold), tb, tn, njac)[:b]
    val = out[:, :vdim]
    jac = None
    if njac:
        jac = jnp.transpose(out[:, vdim:].reshape(b, njac, vdim), (0, 2, 1))
    if inv is not None:
        val = val[inv]
        jac = jac[inv] if jac is not None else None
    return val, jac


def two_head_grads_cells(params, alive, spec: FieldSpec, x: jnp.ndarray,
                         head1, head2, heads_use_val: bool = True):
    """Work-list twin of :func:`two_head_grads_centered`: one gathered
    forward + one dual-cotangent gathered backward over the live tile
    pairs only. ``x`` presorted by ops.spatial.sort_key."""
    from gaussian_fluids_tpu.ops.pallas import gsr_centered, gsr_cells
    d, vdim = spec.d, spec.vdim
    tb, tn = _cells_tiles(d)
    b = x.shape[0]
    clamp = float(spec.clamp_threshold)
    mix = GaussianMixture(params["positions"], params["scalings"],
                          params["rotations"], params["values"], alive)
    x_p, _, tmask_c, rows, cols, gtiles, qtiles, ok = _cells_prep(
        mix, spec, x, tb, tn)
    tbc = max(tb, _CELLS_FALLBACK_TB)
    tnc = max(tn, _CELLS_FALLBACK_TN)

    def prep(p):
        m = GaussianMixture(p["positions"], p["scalings"],
                            p["rotations"], p["values"], alive)
        mu_p, pp_p, v_p = _padded_param_rows(m, spec, tn)
        return mu_p.T, pp_p.T, v_p

    (muT, ppT, v_p), prep_vjp = jax.vjp(prep, params)
    out = _cells_fwd_dispatch(ok, tmask_c, rows, cols, x_p, muT, ppT, v_p,
                              d, vdim, clamp, tb, tn, d)[:b]

    def head_on_out(head, o):
        val = o[:, :vdim]
        jac = jnp.transpose(o[:, vdim:].reshape(b, d, vdim), (0, 2, 1))
        return head(val, jac)

    one = jnp.ones(())
    l1, h1_vjp = jax.vjp(functools.partial(head_on_out, head1), out)
    l2, h2_vjp = jax.vjp(functools.partial(head_on_out, head2), out)
    # pad to the COARSE block (x_p's padding) — a tbc multiple is also a
    # tb multiple, so both cond branches see aligned shapes
    dout1 = _pad_axis(h1_vjp(one)[0], tbc, axis=0)
    dout2 = _pad_axis(h2_vjp(one)[0], tbc, axis=0)
    t1, t2 = jax.lax.cond(
        ok,
        lambda: gsr_cells.fused_gsr_cells_bwd2(
            gtiles, qtiles, x_p, muT, ppT, v_p, dout1, dout2, d, vdim,
            clamp, tb, tn, use_val=heads_use_val),
        lambda: gsr_centered.fused_gsr_centered_bwd2(
            tmask_c, x_p, muT, ppT, v_p, dout1, dout2, d, vdim, clamp,
            tbc, tnc, use_val=heads_use_val))
    g1 = prep_vjp(t1)[0]
    g2 = prep_vjp(t2)[0]
    return (l1, l2), (g1, g2)


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


def rk4_valjac_fused(mix: GaussianMixture, spec: FieldSpec,
                     x: jnp.ndarray, dt, tb: int = 256, tn: int = 512):
    """(phi, val, jac): RK4 endpoint through the velocity field plus
    (value, jacobian) AT the endpoint, in ONE fused Pallas launch (all four
    stages' positions never leave VMEM — replaces five staged kernel
    launches of the 2D covector target, reference 2D/advance.py:46-54).
    Forward-only (no VJP); velocity fields only (vdim == d)."""
    from gaussian_fluids_tpu.ops.pallas.rk4_fused import fused_rk4
    if x.ndim != 2 or x.shape[1] != mix.d:
        raise ValueError(
            f"query points must have shape (B, {mix.d}); got {x.shape}")
    d, vdim = mix.d, mix.vdim
    b = x.shape[0]
    x_p = _pad_axis(x, tb, axis=0)
    mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)
    phi, vj = fused_rk4(x_p, mu_p.T, pp_p.T, v_p, dt, d,
                        float(spec.clamp_threshold), tb, tn, d)
    phi, vj = phi[:b], vj[:b]
    val = vj[:, :vdim]
    jac = jnp.transpose(vj[:, vdim:].reshape(b, d, vdim), (0, 2, 1))
    return phi, val, jac


def value_banded(mix: GaussianMixture, spec: FieldSpec, x: jnp.ndarray,
                 band: int, tb: int = 1024, tn: int = 512,
                 presorted: bool = False) -> jnp.ndarray:
    """Value via the banded forward-only kernel — for huge spatially
    coherent query sets (the density backtrace). Queries are sorted along
    coordinate 0 internally; each query tile visits only a window of
    ``band`` Gaussian tiles starting at its first x-overlapping tile.

    ``band`` (static) should cover the widest x-overlap window, i.e.
    band >= max_i (jhi_i - jlo_i + 1) for the x-dilated tile bounds —
    compute it host-side from the mixture and query extents with a drift
    margin (see solver/simulate3d.advected_density). An insufficient band
    is SAFE but slow: the actual window requirement is checked on-device
    against the same tile bounds, and any violation falls back to the full
    masked-sweep kernel for the whole call (correct result, no silently
    dropped contributions)."""
    from gaussian_fluids_tpu.ops.pallas.gsr_centered import (
        _fwd, fused_gsr_value_banded)
    if x.ndim != 2 or x.shape[1] != mix.d:
        raise ValueError(
            f"query points must have shape (B, {mix.d}); got {x.shape}")
    d, vdim = mix.d, mix.vdim
    b = x.shape[0]
    if presorted:
        xs = x
    else:
        order = jnp.argsort(x[:, 0])
        inv = jnp.argsort(order)
        xs = x[order]
    dead_rows = ~in_domain_mask(mix, spec)
    x_p = _pad_axis(xs, tb, axis=0)
    bp = x_p.shape[0]
    mu_p, pp_p, v_p = _padded_param_rows(mix, spec, tn)

    nbt, nnt = bp // tb, mu_p.shape[0] // tn
    band = min(band, nnt)
    # per-tile x extents
    xb = x_p[:, 0].reshape(nbt, tb)
    valid = (jnp.arange(bp) < b).reshape(nbt, tb)
    blo = jnp.min(jnp.where(valid, xb, jnp.inf), axis=1)
    bhi = jnp.max(jnp.where(valid, xb, -jnp.inf), axis=1)
    dead = _pad_axis(dead_rows.astype(jnp.float32), tn,
                     axis=0, fill=1.0) > 0.5
    mun = mu_p[:, 0].reshape(nnt, tn)
    dn = dead.reshape(nnt, tn)
    s_p = _pad_axis(mix.scalings, tn, axis=0)
    r = support_radius(s_p, spec.clamp_threshold).reshape(nnt, tn)
    nlo = jnp.min(jnp.where(dn, jnp.inf, mun - r), axis=1)
    nhi = jnp.max(jnp.where(dn, -jnp.inf, mun + r), axis=1)
    mask_x = ((bhi[:, None] >= nlo[None, :])
              & (blo[:, None] <= nhi[None, :]))
    jlo = jnp.argmax(mask_x, axis=1).astype(jnp.int32)
    jlo = jnp.clip(jlo, 0, nnt - band)
    clamp = float(spec.clamp_threshold)
    if band == nnt:
        # window is the whole axis — cannot be violated
        out = fused_gsr_value_banded(jlo, x_p, mu_p.T, pp_p.T, v_p, d,
                                     vdim, clamp, tb, tn, band)[:b]
        return out if presorted else out[inv]
    # Runtime band guard: the last interacting N-tile of every query tile
    # must fall inside [jlo, jlo + band). Rows with no interaction are
    # trivially covered (their window contributes exact zeros).
    any_row = jnp.any(mask_x, axis=1)
    jhi = (nnt - 1 - jnp.argmax(mask_x[:, ::-1], axis=1)).astype(jnp.int32)
    covered = jnp.all(jnp.where(any_row, jhi < jlo + band, True))
    out = jax.lax.cond(
        covered,
        lambda: fused_gsr_value_banded(jlo, x_p, mu_p.T, pp_p.T, v_p, d,
                                       vdim, clamp, tb, tn, band),
        lambda: _fwd(mask_x.astype(jnp.int32), x_p, mu_p.T, pp_p.T, v_p,
                     d, vdim, clamp, tb, tn, 0),
    )[:b]
    return out if presorted else out[inv]
