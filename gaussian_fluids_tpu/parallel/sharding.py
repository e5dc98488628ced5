"""Multi-chip scaling via ``jax.sharding.Mesh`` + XLA collectives.

The reference is strictly single-GPU (SURVEY.md §2.8): Taichi kernels with
atomic scatter-adds, device picked by CUDA_VISIBLE_DEVICES. The TPU-native
distribution story replaces that with two mesh axes:

  * ``batch`` — data parallelism over the B collocation points (every loss
    is a mean over B, so gradient reduction is one psum over ICI).
  * ``gauss`` — "tensor parallelism" over the N Gaussians: all field
    contractions are (B, N) @ (N, *) sums over N, so sharding the Gaussian
    axis turns them into partial-sum matmuls + psum.

Two step implementations: sharding annotations on a plain ``jax.jit``
(XLA's SPMD partitioner inserts the collectives — the dense-backend path),
and a ``shard_map`` variant with explicit psum/pmean collectives that runs
the fused Pallas kernels per-shard (XLA cannot partition a pallas_call).
No hand-written NCCL analog anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver import losses, optim


def make_mesh(n_batch: Optional[int] = None,
              n_gauss: int = 1) -> Mesh:
    """Build a (batch, gauss) mesh over the first n_batch*n_gauss devices."""
    devs = jax.devices()
    if n_batch is None:
        n_batch = len(devs) // n_gauss
    use = np.asarray(devs[: n_batch * n_gauss]).reshape(n_batch, n_gauss)
    return Mesh(use, ("batch", "gauss"))


def param_shardings(mesh: Mesh):
    """Gaussian-axis (tensor-parallel) sharding of the four param arrays."""
    return {
        "positions": NamedSharding(mesh, P("gauss", None)),
        "scalings": NamedSharding(mesh, P("gauss", None)),
        "rotations": NamedSharding(mesh, P("gauss")),
        "values": NamedSharding(mesh, P("gauss", None)),
    }


def make_sharded_train_step(spec: FieldSpec, mesh: Mesh):
    """A full sharded training step (the fit/clone inner epoch): batch is
    DP-sharded, Gaussians are TP-sharded, optimizer state follows the
    params. Returns (step_fn, place) where ``place`` lays out a
    (params, opt_state, alive) tuple onto the mesh."""
    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    ref_shard = NamedSharding(mesh, P("batch", None))
    refj_shard = NamedSharding(mesh, P("batch", None, None))
    scalar = NamedSharding(mesh, P())

    def loss_fn(params, alive, x, ref_val, ref_jac):
        mix = GaussianMixture(params["positions"], params["scalings"],
                              params["rotations"], params["values"], alive)
        val, jac = field.value_and_jac(mix, spec, x)
        l_val = losses.value_loss(val, ref_val)
        l_grad = losses.grad_loss(jac, ref_jac)
        l_aniso = losses.aniso_loss(params["scalings"], alive)
        l_vol = losses.volume_loss(params["scalings"], alive)
        return l_val + l_grad + l_aniso + l_vol

    def group_shard(g: optim.GroupState, ps):
        return optim.GroupState(lr=scalar, step=scalar, m=ps, v=ps,
                                best=scalar, num_bad=scalar)

    opt_shardings = optim.OptState(
        groups={k: group_shard(None, pshard[k]) for k in pshard},
        patience=scalar)

    @functools.partial(
        jax.jit,
        in_shardings=(pshard, opt_shardings, alive_shard, data_shard,
                      ref_shard, refj_shard),
        out_shardings=(pshard, opt_shardings, scalar))
    def step(params, opt_state, alive, x, ref_val, ref_jac):
        total, grads = jax.value_and_grad(loss_fn)(params, alive, x,
                                                   ref_val, ref_jac)
        params, opt_state = optim.step(opt_state, params, grads, total)
        return params, opt_state, total

    def place(params, opt_state, alive):
        params = {k: jax.device_put(v, pshard[k])
                  for k, v in params.items()}
        opt_state = jax.device_put(opt_state, opt_shardings)
        alive = jax.device_put(alive, alive_shard)
        return params, opt_state, alive

    return step, place, data_shard


def dryrun(n_devices: int, batch: int = 64, n_gaussians: int = 128) -> None:
    """Create an n-device mesh, jit the FULL sharded training step (dp x tp)
    and run one real step on tiny shapes. Used by __graft_entry__ and the
    multi-device tests."""
    n_gauss_axis = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_devices // n_gauss_axis, n_gauss_axis)
    spec = FieldSpec.create((-5, -5), (5, 5), n_gaussians, d=2, vdim=2)
    rng = np.random.RandomState(0)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n_gaussians, 2)), spec,
                                 pad=False)
    params = mix.params()
    params["values"] = jnp.asarray(
        0.1 * rng.randn(n_gaussians, 2).astype(np.float32))
    opt_state = optim.init(params, {k: 1e-3 for k in params}, patience=50)
    step, place, data_shard = make_sharded_train_step(spec, mesh)
    params, opt_state, alive = place(params, opt_state, mix.alive)
    x = jax.device_put(
        jnp.asarray(rng.uniform(-4, 4, (batch, 2)), jnp.float32), data_shard)
    ref_val = jax.device_put(
        jnp.asarray(0.1 * rng.randn(batch, 2), jnp.float32), data_shard)
    ref_jac = jax.device_put(
        jnp.zeros((batch, 2, 2), jnp.float32),
        NamedSharding(mesh, P("batch", None, None)))
    params0 = {k: jnp.asarray(v) for k, v in params.items()}
    params, opt_state, total = step(params, opt_state, alive, x, ref_val,
                                    ref_jac)
    jax.block_until_ready(total)
    print(f"[parallel.dryrun] mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"loss={float(total):.6f} OK")

    # and the shard_map (Pallas-compatible) step — the path real multi-chip
    # TPU runs take, since XLA cannot partition a pallas_call. Same inputs,
    # so the losses must agree.
    step2, place2, _ = make_sharded_train_step_shardmap(spec, mesh)
    opt2 = optim.init(params0, {k: 1e-3 for k in params0}, patience=50)
    p2, opt2, alive2 = place2(params0, opt2, mix.alive)
    _, _, total2 = step2(p2, opt2, alive2, x, ref_val, ref_jac)
    jax.block_until_ready(total2)
    assert abs(float(total2) - float(total)) < 1e-4 * max(
        1.0, abs(float(total))), (float(total), float(total2))
    print(f"[parallel.dryrun] shard_map step loss={float(total2):.6f} OK")


# ---- shard_map path (Pallas-kernel compatible) ----
#
# XLA's SPMD partitioner cannot partition a pallas_call, so the
# jit-with-shardings step above only reaches the fused kernels when run
# replicated. This variant uses shard_map: every device runs the (Pallas or
# dense) field kernels on its LOCAL (batch-shard x gaussian-shard) block and
# the cross-device reductions are explicit collectives —
#   * field value/jac: partial sums over local Gaussians -> psum("gauss")
#   * data-term losses: means over the local batch -> psum("batch") of grads
#   * regularizers: global masked means via psum'd (sum, count) pairs.

def make_sharded_train_step_shardmap(spec: FieldSpec, mesh: Mesh):
    """(step_fn, place): the fit/clone inner epoch under shard_map.
    Same semantics as make_sharded_train_step; compatible with the fused
    Pallas backends because each device calls the kernel on its own shard."""
    try:
        from jax import shard_map as _sm  # new API (check_vma kwarg)
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = functools.partial(_sm, check_rep=False)

    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    scalar = NamedSharding(mesh, P())

    def group_shard(ps):
        return optim.GroupState(lr=P(), step=P(), m=ps.spec, v=ps.spec,
                                best=P(), num_bad=P())

    opt_specs = optim.OptState(
        groups={k: group_shard(pshard[k]) for k in pshard}, patience=P())
    param_specs = {k: v.spec for k, v in pshard.items()}

    def _global_masked_mean(x, mask):
        s = jax.lax.psum(jnp.where(mask, x, 0.0).sum(), "gauss")
        c = jax.lax.psum(mask.sum(), "gauss")
        return s / jnp.maximum(c, 1)

    def local_loss(params, alive, x, ref_val, ref_jac):
        mix = GaussianMixture(params["positions"], params["scalings"],
                              params["rotations"], params["values"], alive)
        # partial sums over this device's Gaussians, full over its batch
        val_p, jac_p = field.value_and_jac(mix, spec, x)
        val = jax.lax.psum(val_p, "gauss")
        # the clamp constant -c is subtracted once per *supported* Gaussian
        # inside each shard's kernel, so the psum is exactly the global
        # masked sum (support membership is per-Gaussian).
        jac = jax.lax.psum(jac_p, "gauss")
        l_val = losses.value_loss(val, ref_val)          # local-batch mean
        l_grad = losses.grad_loss(jac, ref_jac)
        sca = params["scalings"]
        ratio = jnp.exp(sca.max(-1) - sca.min(-1))
        l_aniso = _global_masked_mean(
            jnp.maximum(ratio, losses.ANISO_RATIO) - losses.ANISO_RATIO,
            alive)
        vol = jnp.exp(-sca.sum(-1))
        mean_vol = _global_masked_mean(vol, alive)
        l_vol = _global_masked_mean((vol / mean_vol - 1.0) ** 2, alive)
        return l_val + l_grad + l_aniso + l_vol

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, opt_specs, P("gauss"), P("batch", None),
                  P("batch", None), P("batch", None, None)),
        out_specs=(param_specs, opt_specs, P()))
    # (vma/rep checking disabled above: pallas_call outputs carry no
    # varying-mesh-axes annotation)
    def step_local(params, opt_state, alive, x, ref_val, ref_jac):
        total, grads = jax.value_and_grad(local_loss)(params, alive, x,
                                                      ref_val, ref_jac)
        # data terms are means over the LOCAL batch: average across the
        # batch axis; regularizer grads are identical on every batch rank
        # so the mean is a no-op for them.
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "batch"), grads)
        total = jax.lax.pmean(total, "batch")
        params, opt_state = optim.step(opt_state, params, grads, total)
        return params, opt_state, total

    step = jax.jit(step_local)

    def place(params, opt_state, alive):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        opt_state = jax.device_put(opt_state, optim.OptState(
            groups={k: optim.GroupState(
                lr=scalar, step=scalar, m=pshard[k], v=pshard[k],
                best=scalar, num_bad=scalar) for k in pshard},
            patience=scalar))
        alive = jax.device_put(alive, alive_shard)
        return params, opt_state, alive

    return step, place, data_shard
