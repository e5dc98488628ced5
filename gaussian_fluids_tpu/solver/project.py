"""Projection: the per-frame PDE solve.

Drives the advected field toward the transported vorticity target with zero
divergence, boundary constraints, and shape regularizers — as a first-order
Adam optimization (reference 2D/advance.py:187-302, 3D/advance.py:182-331).

TPU structure: each epoch is one fused XLA program (sample batch -> RK4
covector target -> one shared forward + two VJP pullbacks for the vorticity
and divergence heads -> PCGrad conflict projection -> regularizer/boundary
grads -> 4-group Adam). Epochs run under ``lax.scan`` in chunks of
``check_iter``; the host only sees test metrics between chunks for the
patience-based early stop (reference 2D/advance.py:282-300), keeping jit
shapes static.

The jitted chunk runners are cached per static configuration and take the
*old* field's parameters as runtime arguments, so the frame loop compiles
exactly once per bucket size instead of once per frame.

The reference computes the vor/div gradients in one kernel pass into
separate buffers (2D/GSR.py:365-476); here ``field.two_head_grads`` shares
one forward and (on the Pallas path) one dual-cotangent backward sweep the
same way.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture, mixture_of
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops import spatial as spatial_ops
from gaussian_fluids_tpu.solver import covector, losses, optim
from gaussian_fluids_tpu.solver.loop import Patience, run_chunked
from gaussian_fluids_tpu.utils.grids import pad_chunks, sweep_group
from gaussian_fluids_tpu.utils import rng


class ProjectWeights(NamedTuple):
    """Loss weights. 2D advance: (1, 1, 10, 10, .5) (reference
    2D/advance.py:198); Karman init: (1, 10, 10, 10, 0) (reference
    2D/initialize.py:55); 3D adds hel=1, val_reg=0 with aniso=vol=10
    (reference 3D/advance.py:184)."""
    vor: float = 1.0
    div: float = 1.0
    aniso: float = 10.0
    vol: float = 10.0
    delta_pos: float = 0.5
    hel: float = 1.0
    val_reg: float = 0.0


def _uniform_batch(key, n, lo, hi):
    d = lo.shape[0]
    return jax.random.uniform(key, (n, d), jnp.float32) * (hi - lo) + lo


# Reference early-stop relative-improvement thresholds and Adam lrs, shared
# with the multi-chip twins (parallel/driver.py) so the paths cannot drift.
PATIENCE_REL_2D = (1e-3, 1e-2)            # (vor, div) — 2D/advance.py:282
PATIENCE_REL_3D = (1e-3, 1e-3, 1e-3)      # (vor, hel, div)
DEFAULT_LRS_2D = {"positions": 1e-4, "scalings": 1e-4, "rotations": 1e-4,
                  "values": 1e-4}          # reference 2D/advance.py:261
DEFAULT_LRS_3D = {"positions": 3e-4, "scalings": 1e-5, "rotations": 3e-4,
                  "values": 1e-5}          # reference 3D/advance.py:258-261


_mix = mixture_of


# --------------------------------------------------------------------------
# 2D
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _runner_2d(spec: FieldSpec, scene_name: str, w: ProjectWeights,
               boundary_lambda: float, batch_size: int,
               target_grid: Optional[tuple]):
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d(scene_name)
    bs1, bs2 = scene.boundary_sampler_1, scene.boundary_sampler_2
    sf = scene.scaling_factor

    def epoch(carry, xs):
        # xs is a tuple when run_chunk hoisted the chunk's sample batches
        # and exact covector targets out of the scan (the Pallas regime;
        # bitwise-identical math, see the 3D run_chunk), a bare key
        # otherwise.
        hoisted = isinstance(xs, tuple)
        if hoisted:
            key, data, ref_vor = xs
        else:
            key = xs
        if target_grid is not None:
            (params, opt_state, alive, positions_org, old_params,
             old_alive, adv, dt, tgt) = carry
        else:
            (params, opt_state, alive, positions_org, old_params,
             old_alive, adv, dt) = carry
        old_mix = _mix(old_params, old_alive)
        kd, kb1, kb2 = jax.random.split(key, 3)
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        # sort once per epoch (losses are batch means): every eval below
        # skips its internal coordinate sort. The sort only tightens the
        # Pallas tile mask — on the dense backend it is pure overhead, so
        # gate it on the same static dispatch predicate.
        sorting = field._use_pallas(batch_size,
                                    params["positions"].shape[0])
        if not hoisted:
            data = _uniform_batch(kd, batch_size, lo, hi)
            if sorting:
                data = data[jnp.argsort(data[:, 0])]
        if hoisted:
            ref_vor = jax.lax.stop_gradient(ref_vor)
        elif target_grid is not None:
            # cached-target mode (see _runner_3d): the exact covector
            # targets were precomputed once on a grid over the (runtime)
            # advance domain; interpolate instead of re-running the RK4
            # backtrace chain. Opt-in; fidelity measured in BASELINE.md.
            from gaussian_fluids_tpu.ops.interp import bilinear_interp
            ref_vor = jax.lax.stop_gradient(bilinear_interp(
                tgt, data, (lo[0], hi[0], lo[1], hi[1])))
        else:
            ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
                old_mix, spec, data, dt, lo, hi, presorted=True))

        def head_vor(val, jac):
            return w.vor * losses.vorticity_loss_2d(jac, ref_vor)

        def head_div(val, jac):
            return w.div * losses.divergence_loss(jac)

        # both 2D heads are jac-only -> the kernel backward skips the
        # value-cotangent matmuls
        (l_vor, l_div), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, head_vor, head_div,
            heads_use_val=False)

        def rest(p):
            m = _mix(p, alive)
            total = (w.aniso * losses.aniso_loss(p["scalings"], alive)
                     + w.vol * losses.volume_loss(p["scalings"], alive)
                     + w.delta_pos * losses.delta_pos_loss(
                         p["positions"], positions_org, alive))
            bc = jnp.zeros(())
            if boundary_lambda > 0.0 and bs1 is not None:
                bd, bval = bs1(kb1, batch_size, adv)
                if sorting:
                    o = jnp.argsort(bd[:, 0])
                    bd, bval = bd[o], bval[o]
                c1 = losses.boundary_dirichlet_loss(
                    field.value(m, spec, bd, presorted=True,
                                need_dx=False), bval)
                total = total + boundary_lambda * c1
                bc = bc + c1
            if boundary_lambda > 0.0 and bs2 is not None:
                bd, bn, bnr = bs2(kb2, batch_size, adv)
                if sorting:
                    o = jnp.argsort(bd[:, 0])
                    bd, bn, bnr = bd[o], bn[o], bnr[o]
                c2 = losses.boundary_flux_loss(
                    field.value(m, spec, bd, presorted=True,
                                need_dx=False), bn, bnr)
                total = total + boundary_lambda * c2
                bc = bc + c2
            return total, bc

        (l_rest, bc), g_rest = jax.value_and_grad(rest, has_aux=True)(params)
        g_data = losses.pcgrad_combine(g_vor, g_div)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        loss_tot = l_vor + l_div + l_rest
        params, opt_state = optim.step(opt_state, params, grads, loss_tot)
        carry = (params, opt_state, alive, positions_org, old_params,
                 old_alive, adv, dt)
        if target_grid is not None:
            carry = carry + (tgt,)
        return carry, jnp.stack([l_vor, l_div, bc])

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        keys = jax.random.split(key, n)
        params = carry[0]
        old_params, old_alive, adv, dt = carry[4], carry[5], carry[6], \
            carry[7]
        if (target_grid is not None
                or os.environ.get("GF_HOIST_TARGETS", "1") == "0"
                or not (field._use_pallas(
                        batch_size, params["positions"].shape[0])
                        or field._use_sparse(
                            batch_size, params["positions"].shape[0],
                            spec.d))):
            return jax.lax.scan(epoch, carry, keys)
        # Exact-target hoist (Pallas regime) — see the 3D run_chunk for
        # the full rationale; bitwise-identical targets, launches
        # amortized over the whole chunk.
        old_mix = _mix(old_params, old_alive)
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        kds = jax.vmap(lambda k: jax.random.split(k, 3)[0])(keys)
        data = jax.vmap(
            lambda k: _uniform_batch(k, batch_size, lo, hi))(kds)
        data = jax.vmap(lambda x: x[jnp.argsort(x[:, 0])])(data)
        g = sweep_group(n, batch_size)
        vor = jax.lax.map(
            lambda c: covector.advected_vorticity_2d(old_mix, spec, c, dt,
                                                     lo, hi, presorted=True),
            data.reshape(n // g, g * batch_size, 2))
        return jax.lax.scan(epoch, carry,
                            (keys, data, vor.reshape(n, batch_size)))

    def _pad_chunks(test_x, b):
        return pad_chunks(test_x, 2, b)

    @jax.jit
    def target_grid_fn(old_params, old_alive, adv, dt):
        """Exact covector targets on an (nx, ny) grid spanning the
        (runtime) advance domain — computed once per projection (the old
        field is frozen within one)."""
        nx, ny = target_grid
        old_mix = _mix(old_params, old_alive)
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        ux = jnp.linspace(0.0, 1.0, nx, dtype=jnp.float32)
        uy = jnp.linspace(0.0, 1.0, ny, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(ux, uy, indexing="ij")
        pts = lo + jnp.stack([gx, gy], -1).reshape(-1, 2) * (hi - lo)
        # x-major flatten -> nondecreasing x -> presorted. Chunked like the
        # 3D/clone variants: one unchunked res^2 backtrace materializes
        # (res^2, N) kernel matrices on the dense backend (karman at 256^2
        # is ~6 GB per RK4 stage).
        xc, _ = pad_chunks(pts, 2, pts.shape[0])
        vor = jax.lax.map(
            lambda c: covector.advected_vorticity_2d(
                old_mix, spec, c, dt, lo, hi, presorted=True), xc)
        return vor.reshape(-1)[: nx * ny].reshape(nx, ny)

    @jax.jit
    def test_ref_fn(old_params, old_alive, test_x, adv, dt):
        """Backtraced target vorticity on the test grid — constant over the
        whole projection (old field and grid are fixed), computed once."""
        old_mix = _mix(old_params, old_alive)
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        xc, _ = _pad_chunks(test_x, test_x.shape[0])
        return jax.lax.map(
            lambda c: covector.advected_vorticity_2d(
                old_mix, spec, c, dt, lo, hi, presorted=True), xc)

    @jax.jit
    def test_fn(params, alive, positions_org, adv, test_x, ref_vor, key):
        mix = _mix(params, alive)
        b = test_x.shape[0]
        xcs, valid = _pad_chunks(test_x, b)

        def one(args):
            xc, rv, vc = args
            _, jac = field.value_and_jac(mix, spec, xc, presorted=True)
            lv = jnp.abs(losses.curl2d(jac) - rv) * vc
            ld = losses.divergence(jac) ** 2 * vc
            return jnp.stack([lv.sum(), ld.sum(), ld.max()])

        out = jax.lax.map(one, (xcs, ref_vor, valid))
        # raw regularizer + boundary values for the reference's test line
        # (printed unweighted, fresh boundary batches per test —
        # 2D/advance.py:239-257,271,286)
        la = losses.aniso_loss(params["scalings"], alive)
        lvl = losses.volume_loss(params["scalings"], alive)
        ldp = losses.delta_pos_loss(params["positions"], positions_org,
                                    alive)
        bc = jnp.zeros(())
        sorting = field._use_pallas(batch_size, params["positions"].shape[0])
        kb1, kb2 = jax.random.split(key)
        if boundary_lambda > 0.0 and bs1 is not None:
            bd, bval = bs1(kb1, batch_size, adv)
            if sorting:
                o = jnp.argsort(bd[:, 0])
                bd, bval = bd[o], bval[o]
            bc = bc + losses.boundary_dirichlet_loss(
                field.value(mix, spec, bd, presorted=True, need_dx=False),
                bval)
        if boundary_lambda > 0.0 and bs2 is not None:
            bd, bn, bnr = bs2(kb2, batch_size, adv)
            if sorting:
                o = jnp.argsort(bd[:, 0])
                bd, bn, bnr = bd[o], bn[o], bnr[o]
            bc = bc + losses.boundary_flux_loss(
                field.value(mix, spec, bd, presorted=True, need_dx=False),
                bn, bnr)
        return (out[:, 0].sum() / b, out[:, 1].sum() / b, out[:, 2].max(),
                la, lvl, ldp, bc)

    return run_chunk, test_ref_fn, test_fn, target_grid_fn


def project_2d(mix: GaussianMixture, spec: FieldSpec,
               old_mix: GaussianMixture, dt: float, *,
               scene, adv_domain, test_x, key,
               weights: ProjectWeights = ProjectWeights(),
               boundary_lambda: float = 1.0,
               lrs: Optional[Dict[str, float]] = None,
               batch_size: int = 512, max_epoch: int = 3000,
               patience: int = 500, check_iter: int = 100,
               verbose: int = 1,
               target_grid_res: int = 0) -> GaussianMixture:
    """2D projection (reference 2D/advance.py:187-302).

    ``target_grid_res`` > 0 enables the cached-covector-target mode: the
    exact RK4 targets are evaluated once on a res^2 grid over the advance
    domain and bilinearly interpolated per epoch (opt-in speed/accuracy
    trade; test metrics are always computed against the exact targets)."""
    if lrs is None:
        lrs = dict(DEFAULT_LRS_2D)
    tg = (int(target_grid_res),) * 2 if target_grid_res else None
    runner = _runner_2d(
        spec, scene.name, weights, float(boundary_lambda), batch_size, tg)
    run_chunk, test_ref_fn, test_fn = runner[:3]

    test_x = jnp.asarray(test_x)
    test_x = test_x[jnp.argsort(test_x[:, 0])]   # presorted test chunks
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    adv = jnp.asarray(adv_domain, jnp.float32)
    dt_j = jnp.asarray(dt, jnp.float32)
    carry = (params, opt_state, mix.alive,
             jax.lax.stop_gradient(mix.positions), old_mix.params(),
             old_mix.alive, adv, dt_j)
    if tg is not None:
        carry = carry + (runner[3](old_mix.params(), old_mix.alive, adv,
                                   dt_j),)

    test_ref = test_ref_fn(old_mix.params(), old_mix.alive, test_x, adv,
                           dt_j)

    def metrics(c, k):
        return jax.device_get(
            test_fn(c[0], c[2], c[3], c[6], test_x, test_ref, k))

    if verbose:
        key, tk = rng.split2(key)
        lv, ld, ldm, la, lvl, ldp, bc = metrics(carry, tk)
        print(f"[projection] loss_vor: {lv}, loss_div: {ld}, "
              f"loss_div_max: {ldm}, loss_aniso: {la}, loss_vol: {lvl}, "
              f"loss_delta_pos: {ldp}, boundary_constraint: {bc}")

    pat_vor, pat_div = (Patience(PATIENCE_REL_2D[0]),
                        Patience(PATIENCE_REL_2D[1]))
    st = time.time()

    def dispatch(c, n):
        nonlocal key
        key, sub = rng.split2(key)
        key, tk = rng.split2(key)
        c2, _ = run_chunk(c, sub, n)
        return c2, None, test_fn(c2[0], c2[2], c2[3], c2[6], test_x,
                                 test_ref, tk)

    def on_chunk(mh, _aux, n):
        nonlocal st
        lv, ld, ldm, la, lvl, ldp, bc = mh
        if verbose:
            print(f"[projection] loss_vor: {lv}, loss_div: {ld}, "
                  f"loss_div_max: {ldm}, loss_aniso: {la}, "
                  f"loss_vol: {lvl}, loss_delta_pos: {ldp}, "
                  f"boundary_constraint: {bc}, time: {time.time() - st}")
            st = time.time()
        pat_vor.update(float(lv), n)
        pat_div.update(float(ld), n)
        return pat_vor.iters >= patience and pat_div.iters >= patience

    carry, _ = run_chunked(carry, dispatch, max_epoch, check_iter,
                           on_chunk, "projection")
    return mix.with_params(carry[0])


# --------------------------------------------------------------------------
# 3D
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _runner_3d(spec: FieldSpec, scene_name: Optional[str],
               w: ProjectWeights, boundary_lambda: float, batch_size: int,
               lo: tuple, hi: tuple,
               target_grid: Optional[tuple]):
    bs_freeslip = None
    if scene_name is not None:
        from gaussian_fluids_tpu.scenes import get_scene_3d
        bs_freeslip = get_scene_3d(scene_name).boundary_sampler
    lo_j = jnp.asarray(lo, jnp.float32)
    hi_j = jnp.asarray(hi, jnp.float32)
    domain6 = (lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])

    def epoch(carry, xs):
        # xs is a tuple when run_chunk hoisted the chunk's sample batches
        # and exact covector targets out of the scan (the Pallas regime;
        # bitwise-identical math, see run_chunk), a bare key otherwise.
        hoisted = isinstance(xs, tuple)
        if hoisted:
            key, data, ref_vor, ref_hel = xs
        else:
            key = xs
        if target_grid is not None:
            (params, opt_state, alive, old_params, old_alive, dt,
             tgt) = carry
        else:
            (params, opt_state, alive, old_params, old_alive, dt) = carry
        old_mix = _mix(old_params, old_alive)
        kd, kb = jax.random.split(key)   # kd consumed by the hoist if any
        sorting = field._use_pallas(batch_size,
                                    params["positions"].shape[0])
        if not hoisted:
            data = _uniform_batch(kd, batch_size, lo_j, hi_j)
            if sorting:
                # canonical spatial key (Morton in 3D): compact cube
                # tiles so the mask can cull y/z too (ops/spatial.py)
                data = data[jnp.argsort(
                    spatial_ops.sort_key(data, lo_j, hi_j))]
        if target_grid is not None:
            # cached-target mode: the exact covector targets were
            # precomputed once on a regular grid (the old field is frozen
            # for the whole projection), so each epoch interpolates
            # instead of re-running the 5 val+jac RK4 evals — the
            # dominant slice of the exact epoch. Opt-in deviation from
            # the reference; fidelity measured in BASELINE.md.
            from gaussian_fluids_tpu.ops.interp import multi_channel_interp
            ref = multi_channel_interp(tgt, data, domain6)
            ref_vor = jax.lax.stop_gradient(ref[:, :3])
            ref_hel = jax.lax.stop_gradient(ref[:, 3])
        elif hoisted:
            ref_vor = jax.lax.stop_gradient(ref_vor)
            ref_hel = jax.lax.stop_gradient(ref_hel)
        else:
            ref_vor, ref_hel = covector.advected_vorticity_3d(
                old_mix, spec, data, dt, presorted=True)
            ref_vor = jax.lax.stop_gradient(ref_vor)
            ref_hel = jax.lax.stop_gradient(ref_hel)

        # helicity accumulates into the vorticity PCGrad bucket
        # (reference 3D/GSR.py:508-520)
        def head_vorhel(val, jac):
            return (w.vor * losses.vorticity_loss_3d(jac, ref_vor)
                    + w.hel * losses.helicity_loss(val, jac, ref_hel))

        def head_div(val, jac):
            return w.div * losses.divergence_loss(jac)

        (l_vorhel, l_div), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, head_vorhel, head_div)

        def rest(p):
            m = _mix(p, alive)
            total = (w.aniso * losses.aniso_loss(p["scalings"], alive)
                     + w.vol * losses.volume_loss(p["scalings"], alive)
                     + w.val_reg * losses.value_reg_loss(p["values"], alive))
            bc = jnp.zeros(())
            if boundary_lambda > 0.0 and bs_freeslip is not None:
                bd, bn = bs_freeslip(kb, batch_size)
                if sorting:
                    o = jnp.argsort(spatial_ops.sort_key(bd, lo_j, hi_j))
                    bd, bn = bd[o], bn[o]
                c = losses.boundary_freeslip_loss(
                    field.value(m, spec, bd, presorted=True,
                                need_dx=False), bn)
                total = total + boundary_lambda * c
                bc = bc + c
            return total, bc

        (l_rest, bc), g_rest = jax.value_and_grad(rest, has_aux=True)(params)
        g_data = losses.pcgrad_combine(g_vor, g_div)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        loss_tot = l_vorhel + l_div + l_rest
        params, opt_state = optim.step(opt_state, params, grads, loss_tot)
        if target_grid is not None:
            carry = (params, opt_state, alive, old_params, old_alive, dt,
                     tgt)
        else:
            carry = (params, opt_state, alive, old_params, old_alive, dt)
        return carry, jnp.stack([l_vorhel, l_div, bc])

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        keys = jax.random.split(key, n)
        params = carry[0]
        old_params, old_alive, dt = carry[3], carry[4], carry[5]
        if (target_grid is not None
                or os.environ.get("GF_HOIST_TARGETS", "1") == "0"
                or not (field._use_pallas(
                        batch_size, params["positions"].shape[0])
                        or field._use_sparse(
                            batch_size, params["positions"].shape[0],
                            spec.d))):
            return jax.lax.scan(epoch, carry, keys)
        # Exact-target hoist (Pallas regime): the old field is frozen for
        # the whole projection, so the chunk's n sample batches and their
        # covector targets are computed HERE in a few big batched RK4
        # sweeps instead of 5 small val+jac evals per epoch inside the
        # scan. Same keys, same sort, same kernels per row — the targets
        # are bitwise-identical to the in-loop computation (per-row
        # reductions; tile-aligned because batch_size % tb == 0), so this
        # is pure launch-amortization, not an approximation (contrast
        # --target_grid). Measured A/B in BASELINE.md.
        old_mix = _mix(old_params, old_alive)
        kds = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        data = jax.vmap(
            lambda k: _uniform_batch(k, batch_size, lo_j, hi_j))(kds)
        data = jax.vmap(lambda x: x[jnp.argsort(
            spatial_ops.sort_key(x, lo_j, hi_j))])(data)
        g = sweep_group(n, batch_size)
        vor, hel = jax.lax.map(
            lambda c: covector.advected_vorticity_3d(old_mix, spec, c, dt,
                                                     presorted=True),
            data.reshape(n // g, g * batch_size, 3))
        return jax.lax.scan(
            epoch, carry, (keys, data, vor.reshape(n, batch_size, 3),
                           hel.reshape(n, batch_size)))

    def _pad_chunks(test_x, b):
        return pad_chunks(test_x, 3, b)

    @jax.jit
    def target_grid_fn(old_params, old_alive, dt):
        """Exact covector targets on the static target grid, as one
        (nx, ny, nz, 4) array [vor_x, vor_y, vor_z, hel] — computed once
        per projection (the old field never changes within one)."""
        nx, ny, nz = target_grid
        old_mix = _mix(old_params, old_alive)
        xs = jnp.linspace(lo[0], hi[0], nx, dtype=jnp.float32)
        ys = jnp.linspace(lo[1], hi[1], ny, dtype=jnp.float32)
        zs = jnp.linspace(lo[2], hi[2], nz, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # x-major: sorted
        xc, _ = pad_chunks(pts, 3, nx * ny * nz)

        def one(c):
            vor, hel = covector.advected_vorticity_3d(old_mix, spec, c, dt,
                                                      presorted=True)
            return jnp.concatenate([vor, hel[:, None]], -1)

        out = jax.lax.map(one, xc).reshape(-1, 4)
        return out[:nx * ny * nz].reshape(nx, ny, nz, 4)

    @jax.jit
    def test_ref_fn(old_params, old_alive, test_x, dt):
        """Backtraced (vorticity, helicity) targets on the test grid —
        constant over the projection, computed once."""
        old_mix = _mix(old_params, old_alive)
        xc, _ = _pad_chunks(test_x, test_x.shape[0])
        return jax.lax.map(
            lambda c: covector.advected_vorticity_3d(old_mix, spec, c, dt,
                                                     presorted=True), xc)

    @jax.jit
    def test_fn(params, alive, test_x, test_ref, key):
        mix = _mix(params, alive)
        ref_vor, ref_hel = test_ref
        b = test_x.shape[0]
        xcs, valid = _pad_chunks(test_x, b)

        def one(args):
            xc, rv, rh, vc = args
            val, jac = field.value_and_jac(mix, spec, xc, presorted=True)
            vor = losses.curl3d(jac)
            lv = jnp.abs(vor - rv).mean(axis=-1) * vc
            lh = jnp.abs(jnp.sum(val * vor, -1) - rh) * vc
            ld = losses.divergence(jac) ** 2 * vc
            return jnp.stack([lv.sum(), lh.sum(), ld.sum(), ld.max()])

        out = jax.lax.map(one, (xcs, ref_vor, ref_hel, valid))
        # raw regularizer + boundary values for the reference's test line
        # (printed unweighted, fresh boundary batch per test —
        # 3D/advance.py:271,295)
        la = losses.aniso_loss(params["scalings"], alive)
        lvl = losses.volume_loss(params["scalings"], alive)
        lvr = losses.value_reg_loss(params["values"], alive)
        bc = jnp.zeros(())
        if boundary_lambda > 0.0 and bs_freeslip is not None:
            bd, bn = bs_freeslip(key, batch_size)
            if field._use_pallas(batch_size, params["positions"].shape[0]):
                o = jnp.argsort(spatial_ops.sort_key(bd, lo_j, hi_j))
                bd, bn = bd[o], bn[o]
            bc = bc + losses.boundary_freeslip_loss(
                field.value(mix, spec, bd, presorted=True, need_dx=False),
                bn)
        return (out[:, 0].sum() / b, out[:, 1].sum() / b,
                out[:, 2].sum() / b, out[:, 3].max(), la, lvl, lvr, bc)

    return run_chunk, test_ref_fn, test_fn, target_grid_fn


def project_3d(mix: GaussianMixture, spec: FieldSpec,
               old_mix: GaussianMixture, dt: float, *,
               domain, test_x, key, scene_name: Optional[str] = None,
               weights: ProjectWeights = ProjectWeights(delta_pos=0.0),
               boundary_lambda: float = 10.0,
               lrs: Optional[Dict[str, float]] = None,
               batch_size: int = 8192, max_epoch: int = 3000,
               patience: int = 500, check_iter: int = 100,
               verbose: int = 1, collect_curves: bool = False,
               target_grid_res: int = 0):
    """3D projection (reference 3D/advance.py:182-331). With
    ``collect_curves`` also returns the per-epoch train losses, log-lr and
    test-loss curves for the reference's loss_{frame}.png plots
    (3D/advance.py:273-331).

    ``target_grid_res`` > 0 enables the cached-covector-target mode: the
    exact RK4 targets are evaluated once on a res^3 grid and trilinearly
    interpolated per epoch (opt-in speed/accuracy trade; test metrics are
    always computed against the exact targets)."""
    if lrs is None:
        lrs = dict(DEFAULT_LRS_3D)
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    tg = (int(target_grid_res),) * 3 if target_grid_res else None
    runner = _runner_3d(
        spec, scene_name, weights, float(boundary_lambda), batch_size,
        (x_min, y_min, z_min), (x_max, y_max, z_max), tg)
    run_chunk, test_ref_fn, test_fn = runner[:3]

    test_x = jnp.asarray(test_x)
    test_x = test_x[jnp.argsort(test_x[:, 0])]   # presorted test chunks
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    dt_j = jnp.asarray(dt, jnp.float32)
    carry = (params, opt_state, mix.alive, old_mix.params(), old_mix.alive,
             dt_j)
    if tg is not None:
        carry = carry + (runner[3](old_mix.params(), old_mix.alive, dt_j),)

    test_ref = test_ref_fn(old_mix.params(), old_mix.alive, test_x, dt_j)

    def metrics(c, k):
        return jax.device_get(test_fn(c[0], c[2], test_x, test_ref, k))

    if verbose:
        key, tk = rng.split2(key)
        lv, lh, ld, ldm, la, lvl, lvr, bc = metrics(carry, tk)
        print(f"[projection] loss_vor: {lv}, loss_hel: {lh}, loss_div: {ld},"
              f" loss_div_max: {ldm}, loss_aniso: {la}, loss_vol: {lvl}, "
              f"loss_val_reg: {lvr}, boundary_constraint: {bc}")

    pat_vor, pat_hel, pat_div = tuple(
        Patience(t) for t in PATIENCE_REL_3D)
    curves = {"train_vor": [], "train_div": [], "log_lr": [],
              "test_vor": [], "test_div": []}
    st = time.time()

    def dispatch(c, n):
        nonlocal key
        key, sub = rng.split2(key)
        key, tk = rng.split2(key)
        c2, aux = run_chunk(c, sub, n)
        return c2, (c2, aux), test_fn(c2[0], c2[2], test_x, test_ref, tk)

    def on_chunk(mh, aux_pair, n):
        nonlocal st
        lv, lh, ld, ldm, la, lvl, lvr, bc = mh
        if collect_curves:
            c2, aux = aux_pair
            aux_np = np.asarray(jax.device_get(aux))
            curves["train_vor"].extend(aux_np[:, 0].tolist())
            curves["train_div"].extend(aux_np[:, 1].tolist())
            lr = float(c2[1].groups["scalings"].lr)
            curves["log_lr"].extend([np.log(lr)] * n)
            curves["test_vor"].append(float(lv))
            curves["test_div"].append(float(ld))
        if verbose:
            print(f"[projection] loss_vor: {lv}, loss_hel: {lh}, "
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
                           on_chunk, "projection")
    result = mix.with_params(carry[0])
    return (result, curves) if collect_curves else result
