"""Uniform-grid culled evaluation backend.

The reference accelerates field queries with a uniform grid + counting sort
rebuilt after every optimizer step (reference 2D/GSR.py:187-229,
3D/GSR.py:172-252): cell size is the *dynamic* search radius (the support
radius of the largest Gaussian, floored at ``min_grid_scale``), the array
dimensions are static (sized by ``min_grid_scale``), and each query visits
its 3^d neighbor cells.

TPU-native translation (no atomics, fully jittable, static shapes):
  * build: cell id per Gaussian -> ``jnp.argsort`` (the counting sort) ->
    rank-within-cell -> scatter ids into a dense (n_cells, capacity) table
    padded with -1. ``capacity`` is a static per-cell cap chosen by the
    caller (bucketed; overflow is reported so callers can re-bucket).
  * query: gather the 3^d * capacity candidate ids per query point, then
    evaluate the same masked Gaussian math as the dense backend on the
    (B, K) candidate set. Because every Gaussian with g >= clamp lies
    within ``grid_scale`` of the query (that is how grid_scale is defined,
    reference 2D/GSR.py:226), the culled result is EXACTLY the dense
    masked sum.

Gradients flow through the gathers (transpose = deterministic scatter-add,
replacing the reference's CUDA atomics).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field as field_ops

_MM = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class CellGrid(NamedTuple):
    table: jnp.ndarray       # (n_cells * capacity,) int32 gaussian ids, -1 pad
    grid_scale: jnp.ndarray  # () f32 dynamic cell size
    overflow: jnp.ndarray    # () i32 count of dropped ids (0 in healthy runs)
    capacity: int            # static per-cell cap


def n_cells(spec: FieldSpec) -> int:
    return int(np.prod(spec.grid_size))


def dynamic_grid_scale(mix: GaussianMixture, spec: FieldSpec) -> jnp.ndarray:
    """max(sqrt(-2 ln c) * exp(-min s), min_grid_scale) (reference
    2D/GSR.py:226), as a traced scalar."""
    r = jnp.sqrt(-2.0 * math.log(spec.clamp_threshold)) \
        * jnp.exp(-mix.min_scaling())
    return jnp.maximum(r, spec.min_grid_scale)


def _cell_coords(points: jnp.ndarray, spec: FieldSpec,
                 grid_scale: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.asarray(spec.lo, jnp.float32)
    gs = jnp.asarray(spec.grid_size, jnp.int32)
    c = jnp.floor((points - lo) / grid_scale).astype(jnp.int32)
    return jnp.clip(c, 0, gs - 1)


def _ravel(coords: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    gs = spec.grid_size
    out = coords[..., 0]
    for i in range(1, len(gs)):
        out = out * gs[i] + coords[..., i]
    return out


def build_grid(mix: GaussianMixture, spec: FieldSpec, capacity: int,
               grid_scale=None) -> CellGrid:
    """Counting-sort the Gaussians into the dense cell table."""
    if grid_scale is None:
        grid_scale = dynamic_grid_scale(mix, spec)
    nc = n_cells(spec)
    n = mix.capacity
    valid = field_ops.in_domain_mask(mix, spec)
    cell = _ravel(_cell_coords(mix.positions, spec, grid_scale), spec)
    cell = jnp.where(valid, cell, nc)          # dump invalid in overflow bin
    order = jnp.argsort(cell)                  # stable counting sort
    sorted_cell = cell[order]
    first = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    in_cap = (rank < capacity) & (sorted_cell < nc)
    slot = jnp.where(in_cap, sorted_cell * capacity + rank,
                     nc * capacity)            # one scratch slot at the end
    table = jnp.full((nc * capacity + 1,), -1, jnp.int32)
    table = table.at[slot].set(order.astype(jnp.int32))
    table = table.at[nc * capacity].set(-1)    # keep scratch slot dead
    overflow = jnp.sum((rank >= capacity) & (sorted_cell < nc)
                       ).astype(jnp.int32)
    return CellGrid(table=table[:nc * capacity], grid_scale=grid_scale,
                    overflow=overflow, capacity=capacity)


def _neighbor_offsets(d: int) -> np.ndarray:
    rng = [-1, 0, 1]
    if d == 2:
        return np.asarray([(i, j) for i in rng for j in rng], np.int32)
    return np.asarray([(i, j, k) for i in rng for j in rng for k in rng],
                      np.int32)


def gather_candidate_ids(grid: CellGrid, spec: FieldSpec,
                         x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3^d * capacity) candidate Gaussian ids (-1 = none)."""
    d = spec.d
    gs = jnp.asarray(spec.grid_size, jnp.int32)
    base = _cell_coords(x, spec, grid.grid_scale)          # (B, d)
    offs = jnp.asarray(_neighbor_offsets(d))               # (3^d, d)
    cells = base[:, None, :] + offs[None, :, :]            # (B, 3^d, d)
    in_bounds = jnp.all((cells >= 0) & (cells < gs), axis=-1)
    cells = jnp.clip(cells, 0, gs - 1)
    cell_id = _ravel(cells, spec)                          # (B, 3^d)
    cap = grid.capacity
    slots = cell_id[..., None] * cap + jnp.arange(cap, dtype=jnp.int32)
    ids = grid.table[slots.reshape(x.shape[0], -1)]
    mask = jnp.repeat(in_bounds, cap, axis=-1)
    return jnp.where(mask, ids, -1)


def value_and_jac_culled(mix: GaussianMixture, spec: FieldSpec,
                         x: jnp.ndarray, grid: CellGrid
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled (val, jac) — exactly equal to the dense masked evaluation."""
    ids = gather_candidate_ids(grid, spec, x)              # (B, K)
    live = ids >= 0
    sids = jnp.maximum(ids, 0)
    P = mix.precisions()                                   # (N, d, d)
    mu = mix.positions[sids]                               # (B, K, d)
    v = mix.values[sids]                                   # (B, K, vdim)
    Pc = P[sids]                                           # (B, K, d, d)
    delta = x[:, None, :] - mu
    Pd = jnp.einsum("bkij,bkj->bki", Pc, delta)
    quad = jnp.einsum("bki,bki->bk", delta, Pd)
    g = jnp.exp(-0.5 * quad)
    m = live & (g >= spec.clamp_threshold)
    mg = jnp.where(m, g, 0.0)
    mg_val = jnp.where(m, g - spec.clamp_threshold, 0.0)
    val = jnp.einsum("bk,bka->ba", mg_val, v)
    jac = -jnp.einsum("bk,bka,bki->bai", mg, v, Pd)
    return val, jac


def value_culled(mix, spec, x, grid):
    return value_and_jac_culled(mix, spec, x, grid)[0]


def suggest_capacity(mix: GaussianMixture, spec: FieldSpec,
                     slack: float = 2.0, floor: int = 8) -> int:
    """Host-side capacity pick: max cell occupancy at the current dynamic
    radius, padded and rounded to a power of two (recompile only on bucket
    jumps)."""
    gs = float(dynamic_grid_scale(mix, spec))
    valid = np.asarray(field_ops.in_domain_mask(mix, spec))
    pos = np.asarray(mix.positions)[valid]
    lo = np.asarray(spec.lo, np.float32)
    dims = np.asarray(spec.grid_size)
    coords = np.clip((pos - lo) // gs, 0, dims - 1).astype(np.int64)
    flat = coords[:, 0]
    for i in range(1, len(dims)):
        flat = flat * dims[i] + coords[:, i]
    occ = np.bincount(flat).max() if flat.size else 1
    want = max(floor, int(math.ceil(occ * slack)))
    return 1 << (want - 1).bit_length()
