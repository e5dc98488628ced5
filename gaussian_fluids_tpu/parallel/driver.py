"""Multi-chip frame-loop driver: the sharded projection as a *runnable
loop*, not just a verified single step.

`make_sharded_project_chunk_2d` wraps the shared per-device projection
epoch (sharding._project_epoch_2d) in a ``lax.scan`` over epochs INSIDE
``shard_map``, with the per-epoch collocation/boundary sampling done
in-graph on each device — one XLA program per ``check_iter`` chunk, the
same host/device split as the single-device hot loop (solver/project.py):
the host only sees test metrics between chunks for the patience early
stop. Each batch-shard row draws its own sample points (the per-epoch key
is folded with the device's batch-axis index; devices along the gauss axis
fold identically so a gauss row sees ONE consistent batch), so the global
batch is ``batch_size`` split across the batch axis — the same statistics
as the single-device epoch at equal global batch.

`project_2d_sharded` is the host loop around it — patience early stop on
test metrics (evaluated with the single-device jitted test fns; params are
global jax.Arrays, XLA inserts the gathers), same defaults as
solver/project.project_2d.

Validated end-to-end on the virtual CPU mesh (tests/test_parallel.py) and
by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.parallel import sharding
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import (
    _uniform_batch, PATIENCE_REL_2D, PATIENCE_REL_3D, DEFAULT_LRS_2D,
    DEFAULT_LRS_3D)
from gaussian_fluids_tpu.solver.loop import Patience, run_chunked
from gaussian_fluids_tpu.utils import rng as rng_utils


def make_sharded_project_chunk_2d(spec: FieldSpec, mesh: Mesh,
                                  scene_name: str,
                                  boundary_lambda: float = 1.0,
                                  weights=None, batch_size: int = 512):
    """(run_chunk, place): ``run_chunk(carry, key, n)`` runs n sharded
    projection epochs as one XLA program. Carry matches the single-device
    runner (solver/project.py _runner_2d): (params, opt_state, alive,
    positions_org, old_params, old_alive, adv, dt). ``batch_size`` is the
    GLOBAL per-epoch batch, split across the mesh's batch axis."""
    epoch, has_bs1, has_bs2, scene, sf = sharding._project_epoch_2d(
        spec, scene_name, boundary_lambda, weights)
    bs1, bs2 = scene.boundary_sampler_1, scene.boundary_sampler_2
    shard_map = sharding._shard_map()

    n_batch = mesh.shape["batch"]
    if batch_size % n_batch:
        raise ValueError(f"global batch {batch_size} not divisible by the "
                         f"batch mesh axis ({n_batch})")
    b_local = batch_size // n_batch

    pshard = sharding.param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    param_specs = {k: v.spec for k, v in pshard.items()}
    carry_specs = (param_specs, sharding._opt_specs(pshard), P("gauss"),
                   P("gauss", None), param_specs, P("gauss"), P(), P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=carry_specs + (P(None, None),),
        out_specs=(carry_specs, P(None, None)))
    def chunk_local(params, opt_state, alive, positions_org, old_params,
                    old_alive, adv, dt, keys):
        # every device on one batch row must draw the SAME samples (they
        # share the batch shard and differ only in their gauss shard)
        dev = jax.lax.axis_index("batch")

        def body(carry, key):
            params, opt_state = carry
            key = jax.random.fold_in(key, dev)
            kd, kb1, kb2 = jax.random.split(key, 3)
            lo = jnp.stack([adv[0], adv[2]]) * sf
            hi = jnp.stack([adv[1], adv[3]]) * sf
            data = _uniform_batch(kd, b_local, lo, hi)
            bd1 = bval1 = bd = bn = bnr = None
            if has_bs1:
                bd1, bval1 = bs1(kb1, b_local, adv)
            if has_bs2:
                bd, bn, bnr = bs2(kb2, b_local, adv)
            params, opt_state, ls = epoch(
                params, opt_state, alive, positions_org, old_params,
                old_alive, adv, dt, data, bd1, bval1, bd, bn, bnr)
            return (params, opt_state), ls

        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state),
                                               keys)
        return (params, opt_state, alive, positions_org, old_params,
                old_alive, adv, dt), ls

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        return chunk_local(*carry, jax.random.split(key, n))

    def place(params, opt_state, alive, positions_org, old_params,
              old_alive, adv, dt):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(
            opt_state, sharding._opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        positions_org = jax.device_put(
            positions_org, NamedSharding(mesh, P("gauss", None)))
        return (params, opt_state, alive, positions_org, old_params,
                old_alive, jnp.asarray(adv, jnp.float32),
                jnp.asarray(dt, jnp.float32))

    return run_chunk, place


def make_sharded_project_chunk_3d(spec: FieldSpec, mesh: Mesh,
                                  scene_name: Optional[str], lo, hi,
                                  boundary_lambda: float = 10.0,
                                  weights=None, batch_size: int = 8192):
    """(run_chunk, place): the 3D twin of make_sharded_project_chunk_2d.
    Carry matches the single-device 3D runner (solver/project.py
    _runner_3d): (params, opt_state, alive, old_params, old_alive, dt).
    ``lo``/``hi`` are the static sampling-domain corners (3-tuples)."""
    bs_freeslip = None
    if scene_name is not None:
        from gaussian_fluids_tpu.scenes import get_scene_3d
        bs_freeslip = get_scene_3d(scene_name).boundary_sampler
    epoch = sharding._project_epoch_3d(spec, boundary_lambda, weights,
                                       has_boundary=bs_freeslip is not None)
    shard_map = sharding._shard_map()

    n_batch = mesh.shape["batch"]
    if batch_size % n_batch:
        raise ValueError(f"global batch {batch_size} not divisible by the "
                         f"batch mesh axis ({n_batch})")
    b_local = batch_size // n_batch
    lo_j = jnp.asarray(lo, jnp.float32)
    hi_j = jnp.asarray(hi, jnp.float32)

    pshard = sharding.param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    param_specs = {k: v.spec for k, v in pshard.items()}
    carry_specs = (param_specs, sharding._opt_specs(pshard), P("gauss"),
                   param_specs, P("gauss"), P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=carry_specs + (P(None, None),),
        out_specs=(carry_specs, P(None, None)))
    def chunk_local(params, opt_state, alive, old_params, old_alive, dt,
                    keys):
        dev = jax.lax.axis_index("batch")

        def body(carry, key):
            params, opt_state = carry
            key = jax.random.fold_in(key, dev)
            kd, kb = jax.random.split(key)
            data = _uniform_batch(kd, b_local, lo_j, hi_j)
            if bs_freeslip is not None:
                bd, bn = bs_freeslip(kb, b_local)
            else:
                # scene-less runner: the epoch's boundary branch is
                # statically removed (has_boundary=False); placeholders
                # keep the call signature uniform
                bd = jnp.zeros((b_local, 3), jnp.float32)
                bn = jnp.zeros((b_local, 3), jnp.float32)
            params, opt_state, ls = epoch(
                params, opt_state, alive, old_params, old_alive, dt,
                data, bd, bn)
            return (params, opt_state), ls

        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state),
                                               keys)
        return (params, opt_state, alive, old_params, old_alive, dt), ls

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        return chunk_local(*carry, jax.random.split(key, n))

    def place(params, opt_state, alive, old_params, old_alive, dt):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(
            opt_state, sharding._opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        return (params, opt_state, alive, old_params, old_alive,
                jnp.asarray(dt, jnp.float32))

    return run_chunk, place


def project_3d_sharded(mix: GaussianMixture, spec: FieldSpec,
                       old_mix: GaussianMixture, dt: float, *,
                       mesh: Mesh, domain, test_x, key,
                       scene_name: Optional[str] = None,
                       weights=None, boundary_lambda: float = 10.0,
                       lrs: Optional[Dict[str, float]] = None,
                       batch_size: int = 8192, max_epoch: int = 3000,
                       patience: int = 500, check_iter: int = 100,
                       verbose: int = 1) -> GaussianMixture:
    """Multi-chip twin of solver/project.project_3d (reference
    3D/advance.py:182-331): every epoch — deformation-chain covector
    target, helicity head, PCGrad, free-slip boundary — runs dp x tp
    sharded over ``mesh``."""
    from gaussian_fluids_tpu.solver.project import _runner_3d, \
        ProjectWeights

    w = weights or ProjectWeights(delta_pos=0.0)
    if lrs is None:
        lrs = dict(DEFAULT_LRS_3D)
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    lo = (x_min, y_min, z_min)
    hi = (x_max, y_max, z_max)
    run_chunk, place = make_sharded_project_chunk_3d(
        spec, mesh, scene_name, lo, hi, float(boundary_lambda), w,
        batch_size)
    _, test_ref_fn, test_fn, _ = _runner_3d(
        spec, scene_name, w, float(boundary_lambda), batch_size, lo, hi,
        None)

    test_x = jnp.asarray(test_x)
    test_x = test_x[jnp.argsort(test_x[:, 0])]
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    carry = place(params, opt_state, mix.alive, old_mix.params(),
                  old_mix.alive, dt)
    dt_j = jnp.asarray(dt, jnp.float32)
    test_ref = test_ref_fn(old_mix.params(), old_mix.alive, test_x, dt_j)

    if verbose:
        key, tk = rng_utils.split2(key)
        lv, lh, ld, ldm, la, lvl, lvr, bc = jax.device_get(
            test_fn(carry[0], carry[2], test_x, test_ref, tk))
        print(f"[projection/sharded] loss_vor: {lv}, loss_hel: {lh}, "
              f"loss_div: {ld}, loss_div_max: {ldm}, loss_aniso: {la}, "
              f"loss_vol: {lvl}, loss_val_reg: {lvr}, "
              f"boundary_constraint: {bc}")

    pat_vor, pat_hel, pat_div = tuple(
        Patience(t) for t in PATIENCE_REL_3D)
    st = time.time()

    def dispatch(c, n):
        nonlocal key
        key, sub = rng_utils.split2(key)
        key, tk = rng_utils.split2(key)
        c2, _ = run_chunk(c, sub, n)
        return c2, None, test_fn(c2[0], c2[2], test_x, test_ref, tk)

    def on_chunk(mh, _aux, n):
        nonlocal st
        lv, lh, ld, ldm, la, lvl, lvr, bc = mh
        if verbose:
            print(f"[projection/sharded] loss_vor: {lv}, loss_hel: {lh}, "
                  f"loss_div: {ld}, loss_div_max: {ldm}, loss_aniso: {la}, "
                  f"loss_vol: {lvl}, loss_val_reg: {lvr}, "
                  f"boundary_constraint: {bc}, time: {time.time() - st}")
            st = time.time()
        pat_vor.update(float(lv), n)
        pat_hel.update(float(lh), n)
        pat_div.update(float(ld), n)
        return (pat_vor.iters >= patience and pat_hel.iters >= patience
                and pat_div.iters >= patience)

    carry, _ = run_chunked(carry, dispatch, max_epoch, check_iter,
                           on_chunk, "projection/sharded")
    return mix.with_params({k: jnp.asarray(v) for k, v in carry[0].items()})


def make_sharded_clone_chunk(spec: FieldSpec, mesh: Mesh,
                             batch_size: int = 512):
    """(run_chunk, place): ``run_chunk(carry, key, n)`` runs n sharded
    clone re-fit epochs as one XLA program. Carry matches the
    single-device clone runner (solver/clone.py _clone_runner): (params,
    opt_state, alive, stop, old_params, old_alive, lo, hi)."""
    epoch = sharding._clone_epoch(spec)
    shard_map = sharding._shard_map()

    n_batch = mesh.shape["batch"]
    if batch_size % n_batch:
        raise ValueError(f"global batch {batch_size} not divisible by the "
                         f"batch mesh axis ({n_batch})")
    b_local = batch_size // n_batch
    d = spec.d

    pshard = sharding.param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    param_specs = {k: v.spec for k, v in pshard.items()}
    carry_specs = (param_specs, sharding._opt_specs(pshard), P("gauss"),
                   P("gauss"), param_specs, P("gauss"), P(), P())

    @functools.partial(
        shard_map, mesh=mesh, in_specs=carry_specs + (P(None, None),),
        out_specs=(carry_specs, P(None, None)))
    def chunk_local(params, opt_state, alive, stop, old_params, old_alive,
                    lo, hi, keys):
        dev = jax.lax.axis_index("batch")

        def body(carry, key):
            params, opt_state = carry
            kd = jax.random.fold_in(key, dev)
            x = _uniform_batch(kd, b_local, lo, hi)
            params, opt_state, aux = epoch(
                params, opt_state, alive, stop, old_params, old_alive, x)
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(body, (params, opt_state),
                                                keys)
        return (params, opt_state, alive, stop, old_params, old_alive,
                lo, hi), aux

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        return chunk_local(*carry, jax.random.split(key, n))

    def place(params, opt_state, alive, stop, old_params, old_alive,
              lo, hi):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(
            opt_state, sharding._opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        stop = jax.device_put(jnp.asarray(stop), alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        return (params, opt_state, alive, stop, old_params, old_alive,
                jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32))

    return run_chunk, place


def clone_velocity_field_sharded(old_mix: GaussianMixture, spec: FieldSpec,
                                 *, mesh: Mesh, lo, hi, test_x, key,
                                 seed: int = 0, d: int = 2,
                                 lrs: Optional[Dict[str, float]] = None,
                                 batch_size: int = 512,
                                 max_epoch: int = 3000,
                                 patience: int = 500, check_iter: int = 100,
                                 verbose: int = 1) -> GaussianMixture:
    """Multi-chip twin of solver/clone.clone_velocity_field: the split
    (host-side restructuring, unchanged) followed by the re-fit with every
    epoch running dp x tp sharded over ``mesh``."""
    import numpy as np
    from gaussian_fluids_tpu.solver.clone import (
        split_gaussians_2d, split_gaussians_3d, _unfreeze_neighbors,
        _repad_like, _clone_runner, PATIENCE_REL_CLONE,
        DEFAULT_LRS_CLONE_2D, DEFAULT_LRS_CLONE_3D)

    rng = np.random.RandomState(seed)
    test_x_s = jnp.asarray(test_x)
    test_x_s = test_x_s[jnp.argsort(test_x_s[:, 0])]
    if d == 2:
        new_mix, stop_np, n_split = split_gaussians_2d(old_mix, spec, rng)
        if lrs is None:
            lrs = dict(DEFAULT_LRS_CLONE_2D)
    else:
        new_mix, stop_np, n_split = split_gaussians_3d(old_mix, spec, rng)
        if lrs is None:
            lrs = dict(DEFAULT_LRS_CLONE_3D)
    if n_split == 0:
        return new_mix
    stop = _unfreeze_neighbors(new_mix, spec, stop_np)
    if verbose:
        print(f"[clone/sharded] Add {n_split} particles.")

    run_chunk, place = make_sharded_clone_chunk(spec, mesh, batch_size)
    # single-device test fns (solver/clone.py) on the global arrays
    _, test_ref_fn, test_fn, _ = _clone_runner(spec, batch_size, None)

    old_padded = _repad_like(old_mix, new_mix.capacity, spec)
    params = new_mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    carry = place(params, opt_state, new_mix.alive, stop,
                  old_padded.params(), old_padded.alive, lo, hi)
    test_ref = test_ref_fn(old_padded.params(), old_padded.alive, test_x_s)

    if verbose:
        lv, lg, la, lvl = jax.device_get(
            test_fn(carry[0], carry[2], carry[3], test_x_s, test_ref))
        print(f"[clone/sharded] loss: {lv}, loss_grad: {lg}, "
              f"loss_aniso: {la}, loss_vol: {lvl}")

    pat_v, pat_g = tuple(Patience(t) for t in PATIENCE_REL_CLONE)
    st = time.time()

    def dispatch(c, n):
        nonlocal key
        key, sub = rng_utils.split2(key)
        c2, _ = run_chunk(c, sub, n)
        return c2, None, test_fn(c2[0], c2[2], c2[3], test_x_s, test_ref)

    def on_chunk(mh, _aux, n):
        nonlocal st
        lv, lg, la, lvl = mh
        if verbose:
            print(f"[clone/sharded] loss: {lv}, loss_grad: {lg}, "
                  f"loss_aniso: {la}, loss_vol: {lvl}, "
                  f"time: {time.time() - st}")
            st = time.time()
        pat_v.update(float(lv), n)
        pat_g.update(float(lg), n)
        return pat_v.iters >= patience and pat_g.iters >= patience

    carry, _ = run_chunked(carry, dispatch, max_epoch, check_iter,
                           on_chunk, "clone/sharded")
    return new_mix.with_params({k: jnp.asarray(v)
                                for k, v in carry[0].items()})


def project_2d_sharded(mix: GaussianMixture, spec: FieldSpec,
                       old_mix: GaussianMixture, dt: float, *,
                       mesh: Mesh, scene, adv_domain, test_x, key,
                       weights=None, boundary_lambda: float = 1.0,
                       lrs: Optional[Dict[str, float]] = None,
                       batch_size: int = 512, max_epoch: int = 3000,
                       patience: int = 500, check_iter: int = 100,
                       verbose: int = 1) -> GaussianMixture:
    """Multi-chip twin of solver/project.project_2d: the full per-frame
    projection (reference 2D/advance.py:187-302) with every epoch running
    dp x tp sharded over ``mesh``. Same defaults, same patience semantics;
    test metrics are computed with the single-device jitted test fns on
    the global (sharded) arrays."""
    from gaussian_fluids_tpu.solver.project import _runner_2d, \
        ProjectWeights

    w = weights or ProjectWeights()
    if lrs is None:
        lrs = dict(DEFAULT_LRS_2D)
    run_chunk, place = make_sharded_project_chunk_2d(
        spec, mesh, scene.name, float(boundary_lambda), w, batch_size)
    # reuse the single-device test fns (solver/project.py)
    _, test_ref_fn, test_fn, _ = _runner_2d(
        spec, scene.name, w, float(boundary_lambda), batch_size, None)

    test_x = jnp.asarray(test_x)
    test_x = test_x[jnp.argsort(test_x[:, 0])]
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    carry = place(params, opt_state, mix.alive,
                  jax.lax.stop_gradient(mix.positions), old_mix.params(),
                  old_mix.alive, adv_domain, dt)
    adv_j = jnp.asarray(adv_domain, jnp.float32)
    dt_j = jnp.asarray(dt, jnp.float32)
    test_ref = test_ref_fn(old_mix.params(), old_mix.alive, test_x, adv_j,
                           dt_j)

    if verbose:
        key, tk = rng_utils.split2(key)
        lv, ld, ldm, la, lvl, ldp, bc = jax.device_get(
            test_fn(carry[0], carry[2], carry[3], adv_j, test_x, test_ref,
                    tk))
        print(f"[projection/sharded] loss_vor: {lv}, loss_div: {ld}, "
              f"loss_div_max: {ldm}, loss_aniso: {la}, loss_vol: {lvl}, "
              f"loss_delta_pos: {ldp}, boundary_constraint: {bc}")

    pat_vor, pat_div = (Patience(PATIENCE_REL_2D[0]),
                        Patience(PATIENCE_REL_2D[1]))
    st = time.time()

    def dispatch(c, n):
        nonlocal key
        key, sub = rng_utils.split2(key)
        key, tk = rng_utils.split2(key)
        c2, _ = run_chunk(c, sub, n)
        return c2, None, test_fn(c2[0], c2[2], c2[3], adv_j, test_x,
                                 test_ref, tk)

    def on_chunk(mh, _aux, n):
        nonlocal st
        lv, ld, ldm, la, lvl, ldp, bc = mh
        if verbose:
            print(f"[projection/sharded] loss_vor: {lv}, loss_div: {ld}, "
                  f"loss_div_max: {ldm}, loss_aniso: {la}, "
                  f"loss_vol: {lvl}, loss_delta_pos: {ldp}, "
                  f"boundary_constraint: {bc}, time: {time.time() - st}")
            st = time.time()
        pat_vor.update(float(lv), n)
        pat_div.update(float(ld), n)
        return pat_vor.iters >= patience and pat_div.iters >= patience

    carry, _ = run_chunked(carry, dispatch, max_epoch, check_iter,
                           on_chunk, "projection/sharded")
    return mix.with_params({k: jnp.asarray(v) for k, v in carry[0].items()})
