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


def _shard_map():
    try:
        from jax import shard_map as _sm  # new API (check_vma kwarg)
        return functools.partial(_sm, check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
        return functools.partial(_sm, check_rep=False)


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

    # and the FULL sharded projection epoch (the per-frame PDE solve:
    # covector RK4 target + dual heads + PCGrad + boundary + Adam) — the
    # production hot loop, not just the fit epoch.
    from jax.sharding import PartitionSpec as _P
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("leapfrog")
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    old = GaussianMixture.create(
        rng.uniform(-4, 4, (n_gaussians, 2)), spec, pad=False)
    old_params = old.params()
    old_params["values"] = jnp.asarray(
        0.1 * rng.randn(n_gaussians, 2).astype(np.float32))
    pstep, pplace, pdata_shard = make_sharded_project_step_2d(
        spec, mesh, "leapfrog", boundary_lambda=1.0)
    opt3 = optim.init(params0, {k: 1e-4 for k in params0}, patience=50)
    sp, sopt, salive, spos, sold, sold_alive = pplace(
        params0, opt3, mix.alive, params0["positions"], old_params,
        old.alive)
    data = jax.device_put(
        jnp.asarray(rng.uniform(-4, 4, (batch, 2)), jnp.float32),
        pdata_shard)
    bd, bn, bnr = scene.boundary_sampler_2(jax.random.PRNGKey(1), batch,
                                           adv)
    put_b = lambda a: jax.device_put(a, pdata_shard)
    _, _, ls = pstep(sp, sopt, salive, spos, sold, sold_alive, adv,
                     jnp.asarray(0.025, jnp.float32), data, put_b(bd),
                     put_b(bn),
                     jax.device_put(bnr, NamedSharding(mesh, _P("batch"))))
    ls = np.asarray(jax.device_get(ls))
    assert np.all(np.isfinite(ls)), ls
    print(f"[parallel.dryrun] projection epoch losses "
          f"vor={ls[0]:.6f} div={ls[1]:.6f} bnd={ls[2]:.6f} OK")

    # and the sharded clone re-fit epoch (freeze mask + in-step old-field
    # targets) — with fit and projection this covers every per-frame
    # optimization phase.
    cstep, cplace, cdata_shard = make_sharded_clone_step(spec, mesh)
    opt4 = optim.init(params0, {k: 1e-3 for k in params0}, patience=50)
    stop = jnp.asarray(rng.rand(n_gaussians) < 0.5)
    cp, copt, calive, cstop, cold, cold_alive = cplace(
        params0, opt4, mix.alive, stop, old_params, old.alive)
    _, _, caux = cstep(cp, copt, calive, cstop, cold, cold_alive,
                       jax.device_put(x, cdata_shard))
    caux = np.asarray(jax.device_get(caux))
    assert np.all(np.isfinite(caux)), caux
    print(f"[parallel.dryrun] clone epoch losses val={caux[0]:.6f} "
          f"grad={caux[1]:.6f} aniso={caux[2]:.6f} vol={caux[3]:.6f} OK")

    # and the runnable chunk loops (parallel/driver.py): a 2-epoch scanned
    # chunk of each, with the per-epoch sampling done in-graph per device.
    from gaussian_fluids_tpu.parallel import driver
    prun, pplace2 = driver.make_sharded_project_chunk_2d(
        spec, mesh, "leapfrog", 1.0, None, batch_size=batch)
    pcarry = pplace2(params0, optim.init(params0,
                                         {k: 1e-4 for k in params0},
                                         patience=50),
                     mix.alive, params0["positions"], old_params,
                     old.alive, scene.advance_domain, 0.025)
    pcarry, pls = prun(pcarry, jax.random.PRNGKey(5), 2)
    pls = np.asarray(jax.device_get(pls))
    assert pls.shape == (2, 3) and np.all(np.isfinite(pls)), pls
    crun, cplace2 = driver.make_sharded_clone_chunk(spec, mesh,
                                                    batch_size=batch)
    ccarry = cplace2(params0, optim.init(params0,
                                         {k: 1e-3 for k in params0},
                                         patience=50),
                     mix.alive, stop, old_params, old.alive,
                     (-5.0, -5.0), (5.0, 5.0))
    ccarry, cls = crun(ccarry, jax.random.PRNGKey(6), 2)
    cls = np.asarray(jax.device_get(cls))
    assert cls.shape == (2, 4) and np.all(np.isfinite(cls)), cls
    print(f"[parallel.dryrun] chunk loops (2 epochs each) project last="
          f"{pls[-1].round(6).tolist()} clone last="
          f"{cls[-1].round(6).tolist()} OK")

    # and the sharded smoke-density step (L7: semi-Lagrangian backtrace of
    # a density volume, batch-sharded grid nodes x gauss-sharded field).
    from gaussian_fluids_tpu.parallel import density as pdensity
    spec3 = FieldSpec.create((-1, -1, -1), (1, 1, 1), n_gaussians, d=3,
                             vdim=3)
    mix3 = GaussianMixture.create(
        rng.uniform(-0.8, 0.8, (n_gaussians, 3)), spec3, pad=False)
    mix3 = GaussianMixture(
        mix3.positions, mix3.scalings, mix3.rotations,
        jnp.asarray(0.1 * rng.randn(n_gaussians, 3), jnp.float32),
        mix3.alive)
    dom3 = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    dens = pdensity.advected_density_sharded(
        jnp.asarray(rng.rand(8, 8, 8), jnp.float32), mix3, spec3, dom3,
        0.05, (8, 8, 8), mesh, chunk=8 * n_devices)
    dens = np.asarray(jax.device_get(dens))
    assert dens.shape == (8, 8, 8) and np.all(np.isfinite(dens))
    print(f"[parallel.dryrun] sharded density step mean={dens.mean():.6f} "
          f"OK")

    # and the 2-frame FRAME LOOP (clone with a forced split -> repad ->
    # advect -> project -> save; reference 2D/advance.py:354-363) through
    # the CLI path under the mesh, asserted against the single-device run
    # — the split/repad-under-sharding seam the per-phase epochs above
    # don't cross (VERDICT r4 weak #6).
    import os
    import shutil
    import tempfile

    from gaussian_fluids_tpu.io import checkpoint as _ckpt
    from gaussian_fluids_tpu.ops import field as _field
    from gaussian_fluids_tpu.solver.simulate2d import (advance_2d,
                                                       initialize_2d)
    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "single")
        shard = os.path.join(td, "sharded")
        os.makedirs(base)
        os.makedirs(shard)
        initialize_2d("taylor_green", base, max_epoch=80, viz=False,
                      particle_count=(8, 8), verbose=0)
        # force a split: make a few rows' anisotropy ratio exceed the 1.5
        # splitting threshold (solver/clone.py split_gaussians_2d) so
        # frame 1's clone MUST grow N and repad under sharding
        m0, spec0 = _ckpt.load_checkpoint(
            os.path.join(base, "gaussian_velocity_0.pt"))
        sca = np.array(m0.scalings)
        sca[:8, 0] += np.log(2.0)
        m0 = GaussianMixture(m0.positions, jnp.asarray(sca), m0.rotations,
                             m0.values, m0.alive)
        _ckpt.save_checkpoint(
            os.path.join(base, "gaussian_velocity_0.pt"), m0, spec0)
        shutil.copy(os.path.join(base, "gaussian_velocity_0.pt"),
                    os.path.join(shard, "gaussian_velocity_0.pt"))
        n0 = int(np.asarray(m0.n_alive()))
        advance_2d("taylor_green", base, dt=.001, last_time=.002,
                   max_epoch=60, viz=False, verbose=0, test_res=(16, 16))
        advance_2d("taylor_green", shard, dt=.001, last_time=.002,
                   max_epoch=60, viz=False, verbose=0, test_res=(16, 16),
                   mesh_shape=(n_devices // n_gauss_axis, n_gauss_axis))
        m1, spec1 = _ckpt.load_checkpoint(
            os.path.join(base, "gaussian_velocity_2.pt"))
        m2, spec2 = _ckpt.load_checkpoint(
            os.path.join(shard, "gaussian_velocity_2.pt"))
        assert spec1 == spec2
        n1, n2 = int(np.asarray(m1.n_alive())), int(np.asarray(m2.n_alive()))
        assert n1 > n0, (n0, n1)  # the forced split actually fired
        assert n1 == n2, (n1, n2)  # same splitting decisions under the mesh
        xq = jnp.asarray(
            np.random.RandomState(3).uniform(0.5, 5.5, (64, 2)), jnp.float32)
        v1, _ = _field.value_and_jac(m1, spec1, xq)
        v2, _ = _field.value_and_jac(m2, spec2, xq)
        scale = float(jnp.abs(v1).mean())
        err = float(jnp.abs(v1 - v2).mean())
        assert err < 0.05 * scale, (err, scale)
        print(f"[parallel.dryrun] frame loop (2 frames, forced split "
              f"{n0}->{n1} under mesh) field agreement "
              f"{err / scale:.4f} OK")


# ---- shard_map path (Pallas-kernel compatible) ----
#
# XLA's SPMD partitioner cannot partition a pallas_call, so the
# jit-with-shardings step above only reaches the fused kernels when run
# replicated. The shard_map steps below run the (Pallas or dense) field
# kernels on each device's LOCAL (batch-shard x gaussian-shard) block and
# make the cross-device reductions explicit collectives —
#   * field value/jac: partial sums over local Gaussians -> psum("gauss")
#   * data-term losses: means over the local batch -> pmean("batch") grads
#   * regularizers: global masked means via psum'd (sum, count) pairs.
#
# Shared building blocks (the fit and projection steps must not drift
# apart in their collective semantics):

def _psum_g(x):
    return jax.lax.psum(x, "gauss")


def _pmean_b(tree):
    return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, "batch"), tree)


def _global_masked_mean(x, mask):
    """Global masked mean over the gauss-sharded axis (psum'd sum/count)."""
    s = jax.lax.psum(jnp.where(mask, x, 0.0).sum(), "gauss")
    c = jax.lax.psum(mask.sum(), "gauss")
    return s / jnp.maximum(c, 1)


def _aniso_vol_sharded(scalings, alive):
    """losses.aniso_loss / volume_loss with cross-shard masked means."""
    ratio = jnp.exp(scalings.max(-1) - scalings.min(-1))
    l_aniso = _global_masked_mean(
        jnp.maximum(ratio, losses.ANISO_RATIO) - losses.ANISO_RATIO, alive)
    vol = jnp.exp(-scalings.sum(-1))
    mean_vol = _global_masked_mean(vol, alive)
    l_vol = _global_masked_mean((vol / mean_vol - 1.0) ** 2, alive)
    return l_aniso, l_vol


def _clone_reg_sharded(scalings, alive, stop):
    """The clone re-fit's regularizers with cross-shard masked means:
    aniso over the UNFROZEN alive rows only, volume with the frozen rows'
    volumes detached but still entering the mean (losses.aniso_loss /
    volume_loss(detach_mask=...), reference 2D/advance.py:108-116)."""
    ratio = jnp.exp(scalings.max(-1) - scalings.min(-1))
    l_aniso = _global_masked_mean(
        jnp.maximum(ratio, losses.ANISO_RATIO) - losses.ANISO_RATIO,
        alive & ~stop)
    s = jnp.where(stop[:, None], jax.lax.stop_gradient(scalings), scalings)
    vol = jnp.exp(-s.sum(-1))
    mean_vol = _global_masked_mean(vol, alive)
    l_vol = _global_masked_mean((vol / mean_vol - 1.0) ** 2, alive)
    return l_aniso, l_vol


def _pcgrad_sharded(g1, g2):
    """losses.pcgrad_combine with global dots/norms (psum over the gauss
    axis; batch ranks hold identical pmean'd grads, so no batch psum)."""
    out = {}
    for k in g1:
        a, b = g1[k], g2[k]
        dot = _psum_g(jnp.vdot(a, b))
        na = a / jnp.maximum(jnp.sqrt(_psum_g(jnp.vdot(a, a))), 1e-30)
        nb = b / jnp.maximum(jnp.sqrt(_psum_g(jnp.vdot(b, b))), 1e-30)
        a2 = a - _psum_g(jnp.vdot(a, nb)) * nb
        b2 = b - _psum_g(jnp.vdot(b, na)) * na
        out[k] = jnp.where(dot < 0.0, a2 + b2, a + b)
    return out


def _opt_specs(pshard):
    """shard_map PartitionSpecs for the optimizer state (scalars
    replicated, moments following their param shards)."""
    return optim.OptState(
        groups={k: optim.GroupState(lr=P(), step=P(), m=pshard[k].spec,
                                    v=pshard[k].spec, best=P(), num_bad=P())
                for k in pshard}, patience=P())


def _opt_shardings(mesh: Mesh, pshard):
    scalar = NamedSharding(mesh, P())
    return optim.OptState(
        groups={k: optim.GroupState(lr=scalar, step=scalar, m=pshard[k],
                                    v=pshard[k], best=scalar,
                                    num_bad=scalar) for k in pshard},
        patience=scalar)


def _mix_of(p, alive):
    return GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                           p["values"], alive)


def make_sharded_train_step_shardmap(spec: FieldSpec, mesh: Mesh):
    """(step_fn, place): the fit/clone inner epoch under shard_map.
    Same semantics as make_sharded_train_step; compatible with the fused
    Pallas backends because each device calls the kernel on its own shard."""
    shard_map = _shard_map()

    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    param_specs = {k: v.spec for k, v in pshard.items()}

    def local_loss(params, alive, x, ref_val, ref_jac):
        # partial sums over this device's Gaussians, full over its batch.
        # The clamp constant -c is subtracted once per *supported* Gaussian
        # inside each shard's kernel, so the psum is exactly the global
        # masked sum (support membership is per-Gaussian).
        val_p, jac_p = field.value_and_jac(_mix_of(params, alive), spec, x)
        val = _psum_g(val_p)
        jac = _psum_g(jac_p)
        l_val = losses.value_loss(val, ref_val)          # local-batch mean
        l_grad = losses.grad_loss(jac, ref_jac)
        l_aniso, l_vol = _aniso_vol_sharded(params["scalings"], alive)
        return l_val + l_grad + l_aniso + l_vol

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, _opt_specs(pshard), P("gauss"),
                  P("batch", None), P("batch", None), P("batch", None, None)),
        out_specs=(param_specs, _opt_specs(pshard), P()))
    # (vma/rep checking disabled in _shard_map: pallas_call outputs carry
    # no varying-mesh-axes annotation)
    def step_local(params, opt_state, alive, x, ref_val, ref_jac):
        total, grads = jax.value_and_grad(local_loss)(params, alive, x,
                                                      ref_val, ref_jac)
        # data terms are means over the LOCAL batch: average across the
        # batch axis; regularizer grads are identical on every batch rank
        # so the mean is a no-op for them.
        grads = _pmean_b(grads)
        total = jax.lax.pmean(total, "batch")
        params, opt_state = optim.step(opt_state, params, grads, total)
        return params, opt_state, total

    step = jax.jit(step_local)

    def place(params, opt_state, alive):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        opt_state = jax.device_put(opt_state, _opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        return params, opt_state, alive

    return step, place, data_shard


def _clone_epoch(spec: FieldSpec):
    """The per-device clone re-fit epoch math, shared by the one-step
    shard_map wrapper (make_sharded_clone_step) and the scanned chunk
    runner (parallel/driver.py). Must be called INSIDE shard_map: it uses
    psum('gauss') / pmean('batch') collectives."""

    def epoch(params, opt_state, alive, stop, old_params, old_alive, x):
        sorting = field._use_pallas(x.shape[0],
                                    params["positions"].shape[0])
        if sorting:
            x = x[jnp.argsort(x[:, 0])]   # sort once; evals run presorted
        rv, rj = field.value_and_jac(_mix_of(old_params, old_alive), spec,
                                     x, presorted=sorting)
        ref_val = jax.lax.stop_gradient(_psum_g(rv))
        ref_jac = jax.lax.stop_gradient(_psum_g(rj))

        def loss_fn(p):
            frozen = losses.freeze_params(p, stop)
            val_p, jac_p = field.value_and_jac(_mix_of(frozen, alive), spec,
                                               x, presorted=sorting,
                                               need_dx=False)
            l_val = losses.value_loss(_psum_g(val_p), ref_val)
            l_grad = losses.grad_loss(_psum_g(jac_p), ref_jac)
            l_aniso, l_vol = _clone_reg_sharded(p["scalings"], alive, stop)
            total = l_val + l_grad + l_aniso + l_vol
            return total, jnp.stack([l_val, l_grad, l_aniso, l_vol])

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        grads = _pmean_b(grads)
        total = jax.lax.pmean(total, "batch")
        aux = jax.lax.pmean(aux, "batch")
        params, opt_state = optim.step(opt_state, params, grads, total)
        return params, opt_state, aux

    return epoch


def make_sharded_clone_step(spec: FieldSpec, mesh: Mesh):
    """(step_fn, place): ONE sharded clone re-fit epoch (reference
    2D/advance.py:96-156, 3D/advance.py:95-165, under dp x tp sharding —
    new scope, SURVEY.md §2.8). With the fit and projection steps this
    makes every per-frame optimization phase multi-chip.

    Differences from the fit epoch (make_sharded_train_step_shardmap):
      * the [val, jac] targets are the OLD field evaluated at the sample
        points inside the step (partial sums over its local Gaussian
        shard -> psum("gauss")), not caller-supplied references;
      * the per-Gaussian ``stop`` freeze mask (gauss-sharded) zeroes the
        frozen rows' gradients via stop_gradient (losses.freeze_params)
        and reshapes the regularizers (_clone_reg_sharded).

    Step signature: step(params, opt_state, alive, stop, old_params,
    old_alive, data) -> (params, opt_state,
    [l_val, l_grad, l_aniso, l_vol])."""
    shard_map = _shard_map()

    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    param_specs = {k: v.spec for k, v in pshard.items()}

    epoch = _clone_epoch(spec)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, _opt_specs(pshard), P("gauss"), P("gauss"),
                  param_specs, P("gauss"), P("batch", None)),
        out_specs=(param_specs, _opt_specs(pshard), P()))
    def step_local(params, opt_state, alive, stop, old_params, old_alive,
                   x):
        return epoch(params, opt_state, alive, stop, old_params, old_alive,
                     x)

    step = jax.jit(step_local)

    def place(params, opt_state, alive, stop, old_params, old_alive):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(opt_state, _opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        stop = jax.device_put(stop, alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        return params, opt_state, alive, stop, old_params, old_alive

    return step, place, data_shard


# ---- sharded PROJECTION epoch (the per-frame PDE solve, shard_map) ----
#
# The production hot loop is the projection epoch (solver/project.py), not
# the fit epoch: RK4 covector backtrace through the OLD field -> two loss
# heads sharing the field outputs -> PCGrad conflict projection -> boundary
# + regularizer grads -> 4-group Adam/plateau. Axes as above. Collectives:
#   * every field evaluation (all 5 covector evals, the head forward, the
#     boundary evals) is a partial sum over local Gaussians -> psum("gauss")
#   * head/boundary losses are local-batch means -> grads pmean("batch")
#   * PCGrad needs GLOBAL <g_vor, g_div> dots/norms: psum("gauss") after
#     the pmean (_pcgrad_sharded)
#   * regularizers: _global_masked_mean / _aniso_vol_sharded.
#
# The PCGrad heads psum the local field partials INSIDE the head
# functions, so ``field.two_head_grads`` applies unchanged per shard: the
# psum transpose broadcasts each head's cotangent at the global output
# back to every shard, the fused dual-cotangent kernel backward runs once
# per shard (same cost shape as the single-device epoch), and the param
# cotangents already live on the local Gaussian shard (no gradient psum
# over the gauss axis).

def _project_epoch_2d(spec: FieldSpec, scene_name: str,
                      boundary_lambda: float, weights):
    """The per-device 2D projection-epoch math, shared by the one-step
    shard_map wrapper (make_sharded_project_step_2d) and the scanned chunk
    runner (parallel/driver.py). Must be called INSIDE shard_map: it uses
    psum('gauss') / pmean('batch') collectives. Boundary rows not used by
    the scene are passed as None."""
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    w = weights or ProjectWeights()
    scene = get_scene_2d(scene_name)
    sf = scene.scaling_factor
    has_bs1 = scene.boundary_sampler_1 is not None
    has_bs2 = scene.boundary_sampler_2 is not None

    def epoch(params, opt_state, alive, positions_org, old_params,
              old_alive, adv, dt, data, bd1, bval1, bd, bn, bnr):
        old_mix = _mix_of(old_params, old_alive)
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        # sort local rows once so every kernel eval below runs presorted
        # (solver/project.py does the same per epoch); dense dispatch
        # skips the sort — it is pure overhead there.
        sorting = field._use_pallas(data.shape[0],
                                    params["positions"].shape[0])
        if sorting:
            data = data[jnp.argsort(data[:, 0])]
            if has_bs1:
                o = jnp.argsort(bd1[:, 0])
                bd1, bval1 = bd1[o], bval1[o]
            if has_bs2:
                o = jnp.argsort(bd[:, 0])
                bd, bn, bnr = bd[o], bn[o], bnr[o]

        def _covector(x):
            """Sharded advected_vorticity_2d: the shared covector finish
            (solver/covector.py vorticity_target_2d_from) with value-only
            RK4 stages and the endpoint Jacobian each psum'd over the
            local Gaussian shard before the next stage consumes them."""
            from gaussian_fluids_tpu.solver.covector import \
                vorticity_target_2d_from
            fval = lambda p: _psum_g(field.value(old_mix, spec, p,
                                                 presorted=sorting,
                                                 need_dx=False))
            fjac = lambda p: _psum_g(field.value_and_jac(
                old_mix, spec, p, presorted=sorting, need_dx=False)[1])
            return vorticity_target_2d_from(fval, fjac, x, dt, lo, hi)

        ref_vor = jax.lax.stop_gradient(_covector(data))

        # Heads psum the LOCAL (val, jac) partials internally: the psum
        # transpose broadcasts each head's global-output cotangent back to
        # every shard, so field.two_head_grads runs its fused
        # dual-cotangent kernel backward per shard (ONE backward sweep for
        # both PCGrad heads, as on a single device) and its param
        # cotangents land directly on the local Gaussian shard — no psum
        # of gradients over the gauss axis is needed.
        def head_vor(val, jac):
            return w.vor * losses.vorticity_loss_2d(_psum_g(jac), ref_vor)

        def head_div(val, jac):
            return w.div * losses.divergence_loss(_psum_g(jac))

        (l_vor, l_div), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, head_vor, head_div,
            presorted=sorting, heads_use_val=False)
        g_vor, g_div = _pmean_b(g_vor), _pmean_b(g_div)
        g_data = _pcgrad_sharded(g_vor, g_div)

        def rest(p):
            m = _mix_of(p, alive)
            l_aniso, l_vol = _aniso_vol_sharded(p["scalings"], alive)
            dp = ((p["positions"] - positions_org) ** 2).mean(axis=-1)
            l_dp = _global_masked_mean(dp, alive)
            total = w.aniso * l_aniso + w.vol * l_vol + w.delta_pos * l_dp
            bc = jnp.zeros(())
            if boundary_lambda > 0.0 and has_bs1:
                v1 = _psum_g(field.value(m, spec, bd1, presorted=sorting,
                                         need_dx=False))
                c1 = losses.boundary_dirichlet_loss(v1, bval1)
                total = total + boundary_lambda * c1
                bc = bc + c1
            if boundary_lambda > 0.0 and has_bs2:
                v2 = _psum_g(field.value(m, spec, bd, presorted=sorting,
                                         need_dx=False))
                c2 = losses.boundary_flux_loss(v2, bn, bnr)
                total = total + boundary_lambda * c2
                bc = bc + c2
            return total, bc

        (l_rest, bc), g_rest = jax.value_and_grad(rest, has_aux=True)(params)
        g_rest = _pmean_b(g_rest)
        l_vor = jax.lax.pmean(l_vor, "batch")
        l_div = jax.lax.pmean(l_div, "batch")
        l_rest = jax.lax.pmean(l_rest, "batch")
        bc = jax.lax.pmean(bc, "batch")
        grads = {k: g_rest[k] + g_data[k] for k in params}
        params, opt_state = optim.step(opt_state, params, grads,
                                       l_vor + l_div + l_rest)
        return params, opt_state, jnp.stack([l_vor, l_div, bc])

    return epoch, has_bs1, has_bs2, scene, sf


def make_sharded_project_step_2d(spec: FieldSpec, mesh: Mesh,
                                 scene_name: str,
                                 boundary_lambda: float = 1.0,
                                 weights=None):
    """(step_fn, place): ONE sharded 2D projection epoch (reference
    2D/advance.py:187-302 under dp x tp sharding — new scope, SURVEY.md
    §2.8; the reference is single-GPU).

    The caller supplies the epoch's sample rows pre-sharded over the batch
    axis, matching the scene's samplers (solver/project.py):
      * always: collocation ``data`` (B, 2);
      * if the scene has a type-1 Dirichlet sampler (karman,
        vortices_pass_noslip): ``bd1`` (B, 2), ``bval1`` (B, 2);
      * if it has a type-2 flux sampler: ``bd`` (B, 2), ``bn`` (B, 2),
        ``bnr`` (B,).
    Step signature: step(params, opt_state, alive, positions_org,
    old_params, old_alive, adv, dt, data[, bd1, bval1][, bd, bn, bnr]).
    Returns updated (params, opt_state) and global [l_vor, l_div, l_bnd]."""
    epoch, has_bs1, has_bs2, _, _ = _project_epoch_2d(
        spec, scene_name, boundary_lambda, weights)
    shard_map = _shard_map()

    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    param_specs = {k: v.spec for k, v in pshard.items()}
    row_specs = (P("batch", None),)
    if has_bs1:
        row_specs += (P("batch", None), P("batch", None))
    if has_bs2:
        row_specs += (P("batch", None), P("batch", None), P("batch"))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, _opt_specs(pshard), P("gauss"),
                  P("gauss", None), param_specs, P("gauss"), P(), P())
                 + row_specs,
        out_specs=(param_specs, _opt_specs(pshard), P()))
    def step_local(params, opt_state, alive, positions_org, old_params,
                   old_alive, adv, dt, data, *rows):
        rows = list(rows)
        bd1 = bval1 = bd = bn = bnr = None
        if has_bs1:
            bd1, bval1 = rows[0], rows[1]
            rows = rows[2:]
        if has_bs2:
            bd, bn, bnr = rows
        return epoch(params, opt_state, alive, positions_org, old_params,
                     old_alive, adv, dt, data, bd1, bval1, bd, bn, bnr)

    step = jax.jit(step_local)

    def place(params, opt_state, alive, positions_org, old_params,
              old_alive):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(opt_state, _opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        positions_org = jax.device_put(positions_org,
                                       NamedSharding(mesh, P("gauss", None)))
        return params, opt_state, alive, positions_org, old_params, old_alive

    return step, place, data_shard


def _project_epoch_3d(spec: FieldSpec, boundary_lambda: float, weights,
                      has_boundary: bool = True):
    """The per-device 3D projection-epoch math, shared by the one-step
    shard_map wrapper (make_sharded_project_step_3d) and the scanned chunk
    runner (parallel/driver.py). Must be called INSIDE shard_map.
    ``has_boundary=False`` (scene-less runner) statically removes the
    boundary evaluation, like the single-device runner's
    ``bs_freeslip is not None`` check."""
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    w = weights or ProjectWeights(delta_pos=0.0)

    def _covector(old_mix, x, dt, presorted):
        """Sharded advected_vorticity_3d: the shared covector finish
        (solver/covector.py covector_targets_3d_from) with every RK4
        stage's (val, jac) psum'd over the gauss axis."""
        from gaussian_fluids_tpu.solver.covector import \
            covector_targets_3d_from

        def f(p):
            v, dv = field.value_and_jac(old_mix, spec, p,
                                        presorted=presorted, need_dx=False)
            return _psum_g(v), _psum_g(dv)

        return covector_targets_3d_from(f, x, dt)

    def epoch(params, opt_state, alive, old_params, old_alive, dt,
              data, bd, bn):
        old_mix = _mix_of(old_params, old_alive)
        sorting = field._use_pallas(data.shape[0],
                                    params["positions"].shape[0])
        if sorting:
            data = data[jnp.argsort(data[:, 0])]
            o = jnp.argsort(bd[:, 0])
            bd, bn = bd[o], bn[o]
        ref_vor, ref_hel = _covector(old_mix, data, dt, sorting)
        ref_vor = jax.lax.stop_gradient(ref_vor)
        ref_hel = jax.lax.stop_gradient(ref_hel)

        # psum-inside-heads: see the 2D step — one fused dual-cotangent
        # backward per shard, param cotangents land on the local shard.
        def head_vorhel(val, jac):
            val, jac = _psum_g(val), _psum_g(jac)
            return (w.vor * losses.vorticity_loss_3d(jac, ref_vor)
                    + w.hel * losses.helicity_loss(val, jac, ref_hel))

        def head_div(val, jac):
            return w.div * losses.divergence_loss(_psum_g(jac))

        (l_vorhel, l_div), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, head_vorhel, head_div,
            presorted=sorting)
        g_vor, g_div = _pmean_b(g_vor), _pmean_b(g_div)
        g_data = _pcgrad_sharded(g_vor, g_div)

        def rest(p):
            m = _mix_of(p, alive)
            l_aniso, l_vol = _aniso_vol_sharded(p["scalings"], alive)
            vr = _global_masked_mean(jnp.abs(p["values"]).mean(axis=-1),
                                     alive)
            total = w.aniso * l_aniso + w.vol * l_vol + w.val_reg * vr
            bc = jnp.zeros(())
            if boundary_lambda > 0.0 and has_boundary:
                vb = _psum_g(field.value(m, spec, bd, presorted=sorting,
                                         need_dx=False))
                bc = losses.boundary_freeslip_loss(vb, bn)
                total = total + boundary_lambda * bc
            return total, bc

        (l_rest, bc), g_rest = jax.value_and_grad(rest, has_aux=True)(params)
        g_rest = _pmean_b(g_rest)
        l_vorhel = jax.lax.pmean(l_vorhel, "batch")
        l_div = jax.lax.pmean(l_div, "batch")
        l_rest = jax.lax.pmean(l_rest, "batch")
        bc = jax.lax.pmean(bc, "batch")
        grads = {k: g_rest[k] + g_data[k] for k in params}
        params, opt_state = optim.step(opt_state, params, grads,
                                       l_vorhel + l_div + l_rest)
        return params, opt_state, jnp.stack([l_vorhel, l_div, bc])

    return epoch


def make_sharded_project_step_3d(spec: FieldSpec, mesh: Mesh,
                                 boundary_lambda: float = 10.0,
                                 weights=None):
    """(step_fn, place): ONE sharded 3D projection epoch (reference
    3D/advance.py:182-331 under dp x tp sharding — new scope, SURVEY.md
    §2.8). Differences from the 2D step: the covector target needs the
    deformation gradient, so every RK4 stage psums BOTH the partial value
    and partial Jacobian over the gauss axis before the tangent chain
    (which is per-batch-row local); the vorticity head also carries the
    helicity term (reference 3D/GSR.py:508-520); the boundary is the
    free-slip box sampler. Sample rows arrive pre-sharded as in 2D."""
    epoch = _project_epoch_3d(spec, boundary_lambda, weights)
    shard_map = _shard_map()

    pshard = param_shardings(mesh)
    alive_shard = NamedSharding(mesh, P("gauss"))
    data_shard = NamedSharding(mesh, P("batch", None))
    param_specs = {k: v.spec for k, v in pshard.items()}

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, _opt_specs(pshard), P("gauss"), param_specs,
                  P("gauss"), P(),
                  P("batch", None), P("batch", None), P("batch", None)),
        out_specs=(param_specs, _opt_specs(pshard), P()))
    def step_local(params, opt_state, alive, old_params, old_alive, dt,
                   data, bd, bn):
        return epoch(params, opt_state, alive, old_params, old_alive, dt,
                     data, bd, bn)

    step = jax.jit(step_local)

    def place(params, opt_state, alive, old_params, old_alive):
        params = {k: jax.device_put(v, pshard[k]) for k, v in params.items()}
        old_params = {k: jax.device_put(v, pshard[k])
                      for k, v in old_params.items()}
        opt_state = jax.device_put(opt_state, _opt_shardings(mesh, pshard))
        alive = jax.device_put(alive, alive_shard)
        old_alive = jax.device_put(old_alive, alive_shard)
        return params, opt_state, alive, old_params, old_alive

    return step, place, data_shard
