"""Sparse cell-list field evaluation — the reference's uniform-grid
culling, re-designed for TPU (VERDICT r2 items 2+3; BASELINE.md round-3
"3D-scale bound" section for the motivation).

At 3D production scale the x-sorted tile mask touches 42-70x more
(query, Gaussian) pairs than the reference's 27-cell walk (measured:
68-115M tile pairs vs 1.6M visited at ring_collide frame 11), because a
bbox over an x-sorted tile cannot cull y/z. This backend enumerates the
EXACT per-query candidate pairs through a static cell grid and evaluates
them as a flat COO list:

    cells     Gaussians counting-sorted by cell id (bincount + cumsum +
              stable argsort — the reference's reinitialize_grid_ti,
              2D/GSR.py:194-222, without atomics);
    pairs     one slot per (query, candidate) pair, enumerated from the
              27-neighborhood segment table with two vectorized
              searchsorteds; slots are ordered by query;
    eval      gathered per-pair quad form (packed precision entries, f32
              VPU) -> exp -> clamp mask -> contributions reduced with
              jnp.segment_sum (sorted segments; deterministic — the TPU
              answer to the reference's atomic "warning: need atomic
              '+='", 2D/GSR.py:284);
    backward  plain JAX AD: the VJP of gather is a deterministic
              scatter-add, of segment_sum a gather. No custom kernels.

Exactness: a Gaussian contributes iff g >= clamp, which implies
|x - mu| <= support_radius(i) (ops/field.py:271). If every alive
Gaussian's support radius fits one cell (r_i <= min cell side) the
27-neighborhood provably contains every contributor, so the sparse sum
equals the dense masked sum BITWISE in structure (same mask, same
per-pair math; reduction order differs). Both guards — radius fit and
pair-capacity overflow — are checked on device; violation falls back to
the dense masked sweep for the whole call via lax.cond (correct result,
no silent drops; the banded kernel's guard pattern, ops/field.py:699).

The grid (one pad-cell ring, like the reference's padded domain,
2D/GSR.py:179) and the pair capacity are STATIC per call site: cell
counts derive from the spec, capacity from (B, N, cells) with headroom.
Queries may lie outside the domain by up to one cell (RK4 backtraces);
farther queries see provably-zero fields and clip into the pad ring.
"""

from __future__ import annotations

import functools
import itertools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import rotations as rotations_ops

_CELLS_ENV = "GF_SPARSE_CELLS"       # override cells per axis (int)
_HEADROOM_ENV = "GF_SPARSE_HEADROOM"  # pair-capacity safety factor
_CHUNK_ENV = "GF_SPARSE_CHUNK"       # max queries per pair-list build

# The pair list is O(B * N / cells): at the solver's hoisted-target sweeps
# (solver/project run_chunk batches ~25 epochs of samples into one
# 204,800-query call) an unchunked list would need ~130M slots and tens of
# GB of temporaries (measured: 66 GB allocation, compile-time OOM on a
# 16 GB chip). Public entry points therefore stream queries through the
# core in fixed chunks; each chunk re-derives the counting sort (cheap
# next to the pair evaluation).
_DEFAULT_CHUNK = 16384


def query_chunk() -> int:
    return int(os.environ.get(_CHUNK_ENV, str(_DEFAULT_CHUNK)))


def grid_dims(spec: FieldSpec) -> Tuple[Tuple[int, ...],
                                        Tuple[float, ...]]:
    """Static (cells per axis, cell size per axis), excluding the pad
    ring. Aims for ~``GF_SPARSE_CELLS`` (default 16) cells along the
    longest axis, cubic-ish cells elsewhere."""
    target = int(os.environ.get(_CELLS_ENV, "16"))
    ext = [hi - lo for lo, hi in zip(spec.lo, spec.hi)]
    h_target = max(ext) / target
    dims = tuple(max(1, int(e / h_target)) for e in ext)
    return dims, tuple(e / g for e, g in zip(ext, dims))


def pair_capacity(b: int, n: int, spec: FieldSpec) -> int:
    """Static slot-count bucket: expected pairs for uniform queries
    (27 * B * N / cells — independent of how the Gaussians cluster)
    with headroom, rounded up to 256k."""
    dims, _ = grid_dims(spec)
    cells = 1
    for g in dims:
        cells *= g
    head = float(os.environ.get(_HEADROOM_ENV, "1.5"))
    est = (3 ** spec.d) * b * n / cells * head
    return max(262_144, int(-(-est // 262_144) * 262_144))


def _cell_ids(pts: jnp.ndarray, spec: FieldSpec, dims, pad_query: bool):
    """Integer cell ids on the padded grid (pad ring = index 0 and G+1).
    Gaussians (pad_query=False) clip to the real cells [1, G]; queries
    clip into the pad ring too."""
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    g = jnp.asarray(dims, jnp.int32)
    h = (hi - lo) / jnp.asarray(dims, jnp.float32)
    ci = jnp.floor((pts - lo) / h).astype(jnp.int32) + 1
    if pad_query:
        ci = jnp.clip(ci, 0, g + 1)
    else:
        ci = jnp.clip(ci, 1, g)
    return ci


def _linearize(ci: jnp.ndarray, dims) -> jnp.ndarray:
    padded = [g + 2 for g in dims]
    lid = ci[..., 0]
    for a in range(1, len(dims)):
        lid = lid * padded[a] + ci[..., a]
    return lid


@functools.partial(jax.jit, static_argnames=("spec", "L", "need_jac"))
def _sparse_value_jac(params, alive, spec: FieldSpec, x: jnp.ndarray,
                      L: int, need_jac: bool):
    """Core sparse evaluation. Returns (val, jac, used_sparse). All index
    math runs under stop_gradient; contributions are differentiable in
    params through the gathers."""
    d, vdim = spec.d, spec.vdim
    b = x.shape[0]
    n = params["positions"].shape[0]
    dims, h = grid_dims(spec)
    padded = [g + 2 for g in dims]
    n_cells = 1
    for p in padded:
        n_cells *= p
    offsets = list(itertools.product((-1, 0, 1), repeat=d))
    n_off = len(offsets)

    mu = params["positions"]
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    in_dom = alive & jnp.all((mu >= lo) & (mu <= hi), axis=-1)

    # --- Gaussian cell table (counting sort, deterministic) ---
    gci = _cell_ids(jax.lax.stop_gradient(mu), spec, dims, pad_query=False)
    gcell = jnp.where(in_dom, _linearize(gci, dims), n_cells)  # dummy last
    perm = jnp.argsort(gcell, stable=True)
    cnt = jnp.bincount(gcell, length=n_cells + 1)
    off = jnp.concatenate([jnp.zeros((1,), cnt.dtype),
                           jnp.cumsum(cnt)[:-1]])
    # The dummy segment (not-in_dom Gaussians: dead padding rows and
    # out-of-domain alive rows) must never be enumerated: pad/boundary
    # queries whose out-of-grid neighbor offsets map to nbr_id == n_cells
    # would otherwise book 19 * dead_count phantom pair slots each and
    # trip the capacity guard at exactly the padded production scales the
    # chunking was built for. Masking them out is exactness-preserving —
    # the dense sum masks not-in_dom rows too (in_domain_mask).
    cnt = cnt.at[n_cells].set(0)

    # --- per-query neighbor segments ---
    qci = _cell_ids(jax.lax.stop_gradient(x), spec, dims, pad_query=True)
    nbr = qci[:, None, :] + jnp.asarray(offsets, jnp.int32)[None]  # (B,27,d)
    ok = jnp.all((nbr >= 0) & (nbr <= jnp.asarray(padded, jnp.int32) - 1),
                 axis=-1)
    nbr_id = jnp.where(ok, _linearize(nbr, dims), n_cells)
    counts = cnt[nbr_id]                                   # (B, n_off)
    flat_counts = counts.reshape(-1)
    starts = jnp.concatenate([jnp.zeros((1,), flat_counts.dtype),
                              jnp.cumsum(flat_counts)[:-1]])
    total = flat_counts.sum()

    # guards: every alive Gaussian must fit one cell, pairs must fit L
    from gaussian_fluids_tpu.ops.field import support_radius
    r = support_radius(params["scalings"], spec.clamp_threshold)
    r_ok = jnp.all(jnp.where(in_dom, r <= min(h), True))
    ok_sparse = r_ok & (total <= L)

    pk = rotations_ops.packed_precision_entries(
        params["scalings"], params["rotations"], d)        # (N, d(d+1)/2)

    def sparse_branch(_):
        s = jnp.arange(L, dtype=starts.dtype)
        loc = jnp.clip(
            jnp.searchsorted(starts, s, side="right") - 1, 0,
            starts.shape[0] - 1)
        within = s - starts[loc]
        valid = s < total
        q = (loc // n_off).astype(jnp.int32)
        seg_cell = nbr_id.reshape(-1)[loc]
        gsort = jnp.clip(off[seg_cell] + within, 0, n - 1).astype(jnp.int32)
        gid = perm[gsort]
        q = jnp.where(valid, q, 0)
        gid = jnp.where(valid, gid, 0)

        xq = x[q]                                          # (L, d)
        delta = xq - mu[gid]                               # differentiable
        pkg = pk[gid]
        quad = jnp.zeros_like(delta[:, 0])
        for a in range(d):
            quad = quad + pkg[:, a] * delta[:, a] * delta[:, a]
        k = d
        for i in range(d):
            for j in range(i + 1, d):
                quad = quad + 2.0 * pkg[:, k] * delta[:, i] * delta[:, j]
                k += 1
        g = jnp.exp(-0.5 * quad)
        m = valid & (g >= spec.clamp_threshold)
        vg = params["values"][gid]                         # (L, vdim)
        mgv = jnp.where(m, g - spec.clamp_threshold, 0.0)
        val = jax.ops.segment_sum(mgv[:, None] * vg, q, num_segments=b,
                                  indices_are_sorted=True)
        if not need_jac:
            return val, jnp.zeros((b, vdim, d), x.dtype)
        # P @ delta from the packed entries
        pd = []
        for i in range(d):
            acc = pkg[:, i] * delta[:, i]
            k = d
            for a in range(d):
                for c2 in range(a + 1, d):
                    if a == i:
                        acc = acc + pkg[:, k] * delta[:, c2]
                    elif c2 == i:
                        acc = acc + pkg[:, k] * delta[:, a]
                    k += 1
            pd.append(acc)
        pd = jnp.stack(pd, axis=-1)                        # (L, d)
        mg = jnp.where(m, g, 0.0)
        contrib = -(mg[:, None, None] * vg[:, :, None] * pd[:, None, :])
        jac = jax.ops.segment_sum(
            contrib.reshape(L, vdim * d), q, num_segments=b,
            indices_are_sorted=True).reshape(b, vdim, d)
        return val, jac

    def dense_branch(_):
        # Guard fallback. On TPU use the streamed Pallas kernel (no (B, N)
        # temporary — a dense fallback at hoisted-sweep batch sizes would
        # need a 50 GB buffer and fail compile-time allocation); on CPU
        # chunk the dense sweep to bound the temporary.
        from gaussian_fluids_tpu.ops import field as field_ops
        mix = GaussianMixture(params["positions"], params["scalings"],
                              params["rotations"], params["values"], alive)
        if jax.default_backend() in ("tpu", "axon"):
            if need_jac:
                return field_ops.value_and_jac_centered(mix, spec, x)
            return (field_ops.value_centered(mix, spec, x, need_dx=False),
                    jnp.zeros((b, vdim, d), x.dtype))
        chunk = 4096
        if b <= chunk:
            if need_jac:
                return field_ops.value_and_jac_dense(mix, spec, x)
            return (field_ops.value_dense(mix, spec, x),
                    jnp.zeros((b, vdim, d), x.dtype))
        nchunk = -(-b // chunk)
        xp = jnp.zeros((nchunk * chunk, d), x.dtype).at[:b].set(x)
        vals, jacs = jax.lax.map(
            lambda xc: field_ops.value_and_jac_dense(mix, spec, xc),
            xp.reshape(nchunk, chunk, d))
        return (vals.reshape(-1, vdim)[:b],
                jacs.reshape(-1, vdim, d)[:b])

    val, jac = jax.lax.cond(ok_sparse, sparse_branch, dense_branch,
                            operand=None)
    return val, jac, ok_sparse


def _chunked(params, alive, spec: FieldSpec, x: jnp.ndarray,
             need_jac: bool):
    """Stream queries through the core in fixed-size chunks so the pair
    list stays bounded regardless of B. Pad queries sit far outside the
    padded grid: they clip into the (always empty) pad ring and consume
    zero pair slots."""
    b, d = x.shape
    chunk = query_chunk()
    n = params["positions"].shape[0]
    if b <= chunk:
        L = pair_capacity(b, n, spec)
        v, j, _ = _sparse_value_jac(params, alive, spec, x, L, need_jac)
        return v, j
    nchunk = -(-b // chunk)
    far = jnp.asarray(spec.lo, jnp.float32) - jnp.asarray(
        [hi - lo for lo, hi in zip(spec.lo, spec.hi)], jnp.float32)
    xp = jnp.broadcast_to(far, (nchunk * chunk, d)).at[:b].set(x)
    L = pair_capacity(chunk, n, spec)
    vals, jacs = jax.lax.map(
        lambda xc: _sparse_value_jac(params, alive, spec, xc, L,
                                     need_jac)[:2],
        xp.reshape(nchunk, chunk, d))
    return (vals.reshape(-1, spec.vdim)[:b],
            jacs.reshape(-1, spec.vdim, d)[:b])


def value_and_jac_sparse(mix: GaussianMixture, spec: FieldSpec,
                         x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(u(x), du/dx) through the cell-list path (dense fallback under the
    guards). Shapes match ops.field.value_and_jac."""
    return _chunked(mix.params(), mix.alive, spec, x, True)


def value_sparse(mix: GaussianMixture, spec: FieldSpec,
                 x: jnp.ndarray) -> jnp.ndarray:
    return _chunked(mix.params(), mix.alive, spec, x, False)[0]


def two_head_grads_sparse(params, alive, spec: FieldSpec, x: jnp.ndarray,
                          head1, head2, heads_use_val: bool = True):
    """Sparse twin of ops.field.two_head_grads: one shared forward, two
    VJP pullbacks (the pullback of the pair gather is a deterministic
    scatter-add over the pair list)."""
    L = pair_capacity(x.shape[0], params["positions"].shape[0], spec)

    def heads(p):
        val, jac, _ = _sparse_value_jac(p, alive, spec, x, L, True)
        return head1(val, jac), head2(val, jac)

    (l1, l2), vjp = jax.vjp(heads, params)
    g1 = vjp((jnp.ones(()), jnp.zeros(())))[0]
    g2 = vjp((jnp.zeros(()), jnp.ones(())))[0]
    return (l1, l2), (g1, g2)
