"""The Gaussian mixture state as a JAX pytree.

Replaces the reference's mutable parameter object holding four
``requires_grad`` torch tensors (reference 2D/GSR.py:36-42, 3D/GSR.py:35-48).
Here it is an immutable dataclass pytree so it can flow through ``jit`` /
``grad`` / ``lax.scan`` and be sharded with ``jax.sharding``.

Dynamic particle counts (splitting adds Gaussians, domain exit removes them —
reference 2D/advance.py:68-84,170-174) are handled with **padding + an alive
mask**: arrays are padded to a bucket size so jitted step functions keep
static shapes; recompilation only happens when N crosses a bucket boundary.
Padded (dead) entries have ``values = 0`` and are additionally masked out of
every field evaluation and loss.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.ops.rotations import precision_matrix, rotation_matrix

PAD_BUCKET = 512  # capacities are multiples of this (Pallas tile divisors)

# Capacity ladder growth factor. Splitting adds O(100) Gaussians per frame
# (reference 2D/advance.py:68-84); with arithmetic 512-buckets a production
# run crosses a bucket every few frames and every jitted phase recompiles
# (~2 minutes of wall-clock on the tunneled TPU runtime — measured 23-45 s
# frames spiking to ~128 s on taylor_vortex). Growing capacity
# geometrically (~25% headroom per crossing) makes the number of
# recompiles over a run O(log N) instead of O(N / 512). Dead padding rows
# are parked in a corner cell and culled by the tile mask, so headroom
# costs almost no compute. GF_PAD_GROWTH=1 restores arithmetic buckets.
_PAD_GROWTH = float(os.environ.get("GF_PAD_GROWTH", "1.25"))


def _bucket(n: int, bucket: int = PAD_BUCKET) -> int:
    cap = bucket
    while cap < n:
        step = max(cap * (_PAD_GROWTH - 1.0), bucket)
        cap = ((cap + int(step) + bucket - 1) // bucket) * bucket
    return cap


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianMixture:
    """N anisotropic Gaussians carrying a ``vdim``-dimensional value.

    positions: (N, d) centres mu_i.
    scalings:  (N, d) log *inverse* scales s_i (reference 2D/GSR.py:40).
    rotations: (N,) angle in 2D; (N, 4) quaternion (r,x,y,z) in 3D.
    values:    (N, vdim) splatted coefficients v_i.
    alive:     (N,) bool — False for padding entries.
    """

    positions: jnp.ndarray
    scalings: jnp.ndarray
    rotations: jnp.ndarray
    values: jnp.ndarray
    alive: jnp.ndarray

    # ---- basic properties ----

    @property
    def capacity(self) -> int:
        """Padded array length (static under jit)."""
        return self.positions.shape[0]

    @property
    def d(self) -> int:
        return self.positions.shape[1]

    @property
    def vdim(self) -> int:
        return self.values.shape[1]

    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # ---- construction ----

    @staticmethod
    def create(positions, spec: FieldSpec, pad: bool = True) -> "GaussianMixture":
        """Create from initial centres with the reference's initial state:
        scalings = spec.initial_scaling, identity rotations, zero values
        (reference 2D/GSR.py:40-42,181; 3D/GSR.py:39-43,166)."""
        positions = jnp.asarray(positions, jnp.float32)
        n, d = positions.shape
        cap = _bucket(n) if pad else n
        pos = jnp.zeros((cap, d), jnp.float32)
        pos = pos.at[:n].set(positions)
        # Park padding at the padded-domain corner so it lands in a real grid
        # cell but (values = 0, alive = False) never contributes.
        pos = pos.at[n:].set(jnp.asarray(spec.lo, jnp.float32))
        scalings = jnp.full((cap, d), spec.initial_scaling, jnp.float32)
        if d == 2:
            rotations = jnp.zeros((cap,), jnp.float32)
        else:
            rotations = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
        values = jnp.zeros((cap, spec.vdim), jnp.float32)
        alive = jnp.zeros((cap,), bool).at[:n].set(True)
        return GaussianMixture(pos, scalings, rotations, values, alive)

    @staticmethod
    def from_arrays(positions, scalings, rotations, values,
                    spec: FieldSpec, pad: bool = True,
                    min_capacity: int = 0) -> "GaussianMixture":
        """Wrap existing (unpadded) parameter arrays, re-padding to a bucket.

        ``min_capacity`` keeps a previous (larger) padding bucket when N
        shrinks — capacity hysteresis. Re-bucketing downward recompiles
        every jitted phase (tens of seconds each on the tunneled TPU
        runtime), and scenes like Karman lose a few Gaussians per frame to
        the moving domain, which would otherwise cross a bucket boundary
        every couple of frames."""
        positions = jnp.asarray(positions, jnp.float32)
        n, d = positions.shape
        cap = max(_bucket(n), min_capacity) if pad else n
        def _pad(a, fill=0.0):
            a = jnp.asarray(a, jnp.float32)
            out = jnp.full((cap,) + a.shape[1:], fill, jnp.float32)
            return out.at[:n].set(a)
        pos = _pad(positions)
        pos = pos.at[n:].set(jnp.asarray(spec.lo, jnp.float32))
        rot = _pad(rotations)
        if d == 3:
            rot = rot.at[n:, 0].set(1.0)
        alive = jnp.zeros((cap,), bool).at[:n].set(True)
        return GaussianMixture(pos, _pad(scalings), rot, _pad(values), alive)

    def spatially_sorted(self) -> "GaussianMixture":
        """Reorder Gaussians by the canonical spatial key (dead rows
        last): coordinate 0 in 2D (thin x-slab tiles are optimal there),
        Morton/Z-order in 3D (tiles become compact cubes so the tile
        mask can cull y and z too — ops/spatial.py).

        Gaussian order is semantically irrelevant (all evaluations are
        order-invariant sums), but the block-sparse Pallas backends
        (ops/field.py value_and_jac_centered / the gsr_cells work-list
        kernels) skip (query-tile x gaussian-tile) pairs by bounding box,
        which only pays off when tiles are spatially compact. The solver
        calls this at frame boundaries; within a frame positions drift
        too slowly to matter. Jittable.

        NOTE for x-band consumers (the banded density kernel,
        ops/field.py value_banded): under the opt-in Morton key
        (GF_SPATIAL_KEY=morton, measured worse at production tiles —
        ops/spatial.sort_key) 3D checkpoints are NOT x-sorted;
        value_banded's band guard handles any order safely, but band
        efficiency requires the caller to re-sort by x
        (solver/simulate3d does at load via x_sorted())."""
        import os
        if self.d == 3 and os.environ.get("GF_SPATIAL_KEY") == "morton":
            from gaussian_fluids_tpu.ops import spatial as spatial_ops
            pos = self.positions
            big = jnp.where(self.alive[:, None], pos, jnp.nan)
            lo = jnp.nan_to_num(jnp.nanmin(big, axis=0), nan=0.0)
            hi = jnp.nan_to_num(jnp.nanmax(big, axis=0), nan=1.0)
            key = spatial_ops.morton_key(pos, lo, hi)
            key = jnp.where(self.alive, key, jnp.int32(1 << 30))
        else:
            key = jnp.where(self.alive, self.positions[:, 0], jnp.inf)
        order = jnp.argsort(key, stable=True)
        return GaussianMixture(self.positions[order], self.scalings[order],
                               self.rotations[order], self.values[order],
                               self.alive[order])

    def x_sorted(self) -> "GaussianMixture":
        """Reorder by position coordinate 0 (dead rows last) regardless of
        dimension — the order the banded x-window kernel (ops/field.py
        value_banded) needs for narrow bands. The density replay re-sorts
        loaded (Morton-ordered in 3D) checkpoints through this."""
        key = jnp.where(self.alive, self.positions[:, 0], jnp.inf)
        order = jnp.argsort(key, stable=True)
        return GaussianMixture(self.positions[order], self.scalings[order],
                               self.rotations[order], self.values[order],
                               self.alive[order])

    def compact(self) -> "GaussianMixture":
        """Drop padding (host-side; not jittable)."""
        keep = np.asarray(self.alive)
        return GaussianMixture(
            jnp.asarray(np.asarray(self.positions)[keep]),
            jnp.asarray(np.asarray(self.scalings)[keep]),
            jnp.asarray(np.asarray(self.rotations)[keep]),
            jnp.asarray(np.asarray(self.values)[keep]),
            jnp.ones((int(keep.sum()),), bool),
        )

    # ---- differentiable-parameter view ----
    #
    # ``alive`` is a bool mask, so ``jax.grad`` over a whole mixture is a
    # type error. Training differentiates w.r.t. the 4-array param dict
    # (the analog of the reference's four optimizer groups, 2D/GSR.py:60-65)
    # and re-attaches the mask:

    def params(self) -> Dict[str, jnp.ndarray]:
        return {
            "positions": self.positions,
            "scalings": self.scalings,
            "rotations": self.rotations,
            "values": self.values,
        }

    def with_params(self, p: Dict[str, jnp.ndarray]) -> "GaussianMixture":
        return GaussianMixture(p["positions"], p["scalings"],
                               p["rotations"], p["values"], self.alive)

    # ---- covariance ----

    def rotation_matrices(self) -> jnp.ndarray:
        return rotation_matrix(self.rotations, self.d)

    def precisions(self) -> jnp.ndarray:
        """Sigma^{-1} per Gaussian, (N, d, d) (reference 2D/GSR.py:104-108)."""
        return precision_matrix(self.scalings, self.rotations, self.d)

    # ---- interop with the reference checkpoint layout ----

    def to_param_dict(self) -> Dict[str, np.ndarray]:
        m = self.compact()
        return {
            "positions": np.asarray(m.positions),
            "scalings": np.asarray(m.scalings),
            "rotations": np.asarray(m.rotations),
            "values": np.asarray(m.values),
        }

    def min_scaling(self) -> jnp.ndarray:
        """min over alive entries (drives the dynamic search radius,
        reference 2D/GSR.py:226)."""
        s = jnp.where(self.alive[:, None], self.scalings, jnp.inf)
        return jnp.min(s)


def mixture_of(params, alive) -> GaussianMixture:
    """Mixture view over a param dict + alive mask — the hot-loop
    constructor shared by the solver phases and the sharded steps."""
    return GaussianMixture(params["positions"], params["scalings"],
                           params["rotations"], params["values"], alive)
