"""Multi-chip smoke-density pipeline (L7 of SURVEY.md §1): the 512^3
semi-Lagrangian backtrace sharded over the device mesh.

The single-device replay (solver/simulate3d.py ``advected_density``,
reference 3D/advance_density.py:52-59) dispatches 262k-point chunks
serially on one chip. The grid nodes are independent, so the step is
embarrassingly parallel over the ``batch`` mesh axis; the velocity
evaluation inside each RK4 stage is a sum over Gaussians, so the ``gauss``
axis TP-shards the mixture with one ``psum`` per stage — the same two-axis
layout as the training steps (parallel/sharding.py). The density volume is
replicated (it is read-only within a step and every device gathers from
arbitrary backtraced coordinates).

shard_map (not jit-with-shardings) so each device can run the fused Pallas
value kernel on its own (batch shard, gauss shard) block — XLA cannot
partition a ``pallas_call``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field, interp
from gaussian_fluids_tpu.ops.advect import rk4_pos_stages
from gaussian_fluids_tpu.parallel.sharding import (_mix_of, _shard_map,
                                                   param_shardings)


@functools.lru_cache(maxsize=None)
def make_sharded_density_step(spec: FieldSpec, mesh: Mesh, domain: tuple):
    """(step_fn, place, data_shard): one semi-Lagrangian density step under
    shard_map, cached per (spec, mesh, domain) — fresh jit closures would
    re-lower per replay frame, which costs tens of seconds on the tunneled
    runtime (see solver/simulate3d.py ``_density_step_pallas``).

    ``step_fn(params, alive, xc, dens, dtj)`` RK4-backtraces the
    batch-sharded query chunk ``xc`` through the gauss-sharded velocity
    field (psum over the gauss axis per stage), clamps to the domain and
    trilinearly samples the replicated old density — the reference's
    ``advected_density`` body (3D/advance_density.py:52-59) as one SPMD
    program. ``place(params, alive, dens)`` lays the operands onto the
    mesh; chunks go onto ``data_shard``.
    """
    shard_map = _shard_map()
    pshard = param_shardings(mesh)
    param_specs = {k: v.spec for k, v in pshard.items()}
    data_shard = NamedSharding(mesh, P("batch", None))
    dens_shard = NamedSharding(mesh, P(None, None, None))
    lo = jnp.asarray([domain[0], domain[2], domain[4]], jnp.float32)
    hi = jnp.asarray([domain[1], domain[3], domain[5]], jnp.float32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, P("gauss"), P("batch", None),
                  P(None, None, None), P()),
        out_specs=P("batch"))
    def step_local(params, alive, xc, dens, dtj):
        m = _mix_of(params, alive)
        # partial sum over this device's Gaussians -> exact global value
        # (the -clamp_threshold truncation is per supported Gaussian, see
        # parallel/sharding.py local_loss note). Grid-node chunks are
        # x-sorted by construction and contiguous batch sharding keeps each
        # shard sorted; presorted only loosens Pallas tile bounds for the
        # drifted inner stages (never correctness — ops/field.py value).
        f = lambda q: jax.lax.psum(
            field.value(m, spec, q, presorted=True, need_dx=False), "gauss")
        bk = jnp.clip(rk4_pos_stages(f, xc, -dtj), lo, hi)
        return interp.trilinear_interp(dens, bk, domain)

    step = jax.jit(step_local)

    def place(params, alive, dens):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        alive = jax.device_put(alive, NamedSharding(mesh, P("gauss")))
        dens = jax.device_put(dens, dens_shard)
        return params, alive, dens

    return step, place, data_shard


def advected_density_sharded(density, mix: GaussianMixture, spec: FieldSpec,
                             domain, dt, grid_shape, mesh: Mesh,
                             chunk: int = 262144):
    """Drop-in sharded ``advected_density``: one semi-Lagrangian step of the
    (xn, yn, zn) density volume over the mesh. Chunks stream through the
    device-side step asynchronously; the caller fetches the final volume
    once (for the .vti write), exactly like the single-device driver."""
    xn, yn, zn = grid_shape
    if jax.default_backend() not in ("tpu", "axon"):
        # dense backend: bound the per-device (B, N) kernel matrix exactly
        # as the single-device sweep does (solver/simulate3d.py
        # advected_density), floored to a power of two for cache stability
        cap_chunk = max(4096, (1 << 29) // max(mix.capacity, 1))
        chunk = min(chunk, 1 << (cap_chunk.bit_length() - 1))
    n_batch = mesh.shape["batch"]
    chunk = max(n_batch, chunk - chunk % n_batch)
    from gaussian_fluids_tpu.solver.simulate3d import _grid_chunks_device
    step, place, data_shard = make_sharded_density_step(
        spec, mesh, tuple(domain))
    params, alive, dens = place(mix.params(), mix.alive,
                                jnp.asarray(density))
    # mesh-resident chunks, uploaded once per process (shared cache with
    # the single-device sweep; sharding keys the cache entry)
    xcs, n = _grid_chunks_device(tuple(domain), (xn, yn, zn), chunk,
                                 data_shard)
    dtj = jnp.asarray(dt, jnp.float32)
    outs = [step(params, alive, xc, dens, dtj) for xc in xcs]
    return jnp.concatenate(outs)[:n].reshape(xn, yn, zn)
