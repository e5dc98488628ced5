"""Clone + adaptive splitting ("reseeding") and the re-fit that follows.

Per frame the solver copies the current field, splits over-stretched
Gaussians into two children, freezes everything except the children and
their neighbours, and re-fits to the old field (reference
2D/advance.py:58-158, 3D/advance.py:51-165).

Splitting is a host-side (numpy) restructuring — it runs once per frame and
changes N, so it lives outside jit; arrays are re-padded to the bucket size
and the jitted training loop keeps static shapes. The re-fit is a chunked
``lax.scan`` like solver/fit.py, with per-Gaussian freezing applied by
stop-gradient masks (replacing the reference kernels' ``stop_gradient[j]``
row skips, 2D/GSR.py:291-292).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture, mixture_of
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops import spatial as spatial_ops
from gaussian_fluids_tpu.ops.rotations import precision_matrix
from gaussian_fluids_tpu.solver import losses, optim
from gaussian_fluids_tpu.solver.loop import Patience, run_chunked
from gaussian_fluids_tpu.utils.grids import pad_chunks
from gaussian_fluids_tpu.utils import rng as rng_utils


def _repad_like(mix: GaussianMixture, capacity: int,
                spec: FieldSpec) -> GaussianMixture:
    """Re-pad a mixture to a target capacity (>= its alive count) so the
    old/new fields share one jit specialization per bucket size.
    ``from_arrays(min_capacity=...)`` owns the padded-row invariants
    (dead rows parked at spec.lo, identity quaternions)."""
    if mix.capacity == capacity:
        return mix
    m = mix.compact()
    return GaussianMixture.from_arrays(m.positions, m.scalings, m.rotations,
                                       m.values, spec,
                                       min_capacity=capacity)


def _sample_children(rng: np.random.RandomState, mu: np.ndarray,
                     prec: np.ndarray, n_children: int = 2) -> np.ndarray:
    """Sample children from N(mu, prec^{-1}) (reference uses
    MultivariateNormal(..., precision_matrix=sym(prec)).sample((2,)),
    2D/advance.py:72). prec is symmetrised first."""
    prec = 0.5 * (prec + np.swapaxes(prec, -1, -2))
    L = np.linalg.cholesky(prec)          # prec = L L^T
    z = rng.standard_normal((n_children,) + mu.shape).astype(np.float32)
    # x = mu + L^{-T} z  has covariance (L L^T)^{-1}
    delta = np.linalg.solve(np.swapaxes(L, -1, -2)[None], z[..., None])
    return (mu[None] + delta[..., 0]).reshape(-1, mu.shape[-1])


def split_gaussians_2d(mix: GaussianMixture, spec: FieldSpec,
                       rng: np.random.RandomState
                       ) -> Tuple[GaussianMixture, np.ndarray, int]:
    """One splitting pass, ratio >= 1.5, shrink the long axis by log(1.5)
    (reference 2D/advance.py:67-86). Returns (new mixture, stop_gradient
    mask over compact entries, number of parents split)."""
    m = mix.compact()
    pos = np.asarray(m.positions)
    sca = np.asarray(m.scalings)
    rot = np.asarray(m.rotations)
    val = np.asarray(m.values)
    ratio = np.exp(sca.max(-1) - sca.min(-1))
    need = ratio >= 1.5
    n_split = int(need.sum())
    if n_split == 0:
        # nothing split: hand back the input mixture untouched instead of
        # round-tripping all N rows through host compaction + re-upload
        return mix, np.ones((pos.shape[0],), bool), 0

    prec = np.asarray(precision_matrix(jnp.asarray(sca[need]),
                                       jnp.asarray(rot[need]), 2))
    child_pos = _sample_children(rng, pos[need], prec)
    child_rot = np.tile(rot[need], 2)
    child_sca = np.tile(sca[need], (2, 1))
    axis1 = child_sca[:, 1] < child_sca[:, 0]
    child_sca[axis1, 1] += np.log(1.5)
    child_sca[~axis1, 0] += np.log(1.5)
    child_val = np.tile(val[need], (2, 1))

    new_pos = np.concatenate([pos[~need], child_pos])
    new_rot = np.concatenate([rot[~need], child_rot])
    new_sca = np.concatenate([sca[~need], child_sca])
    new_val = np.concatenate([val[~need], child_val])
    stop = np.zeros((new_pos.shape[0],), bool)
    stop[: int((~need).sum())] = True
    # coordinate-0 sort for the block-sparse backend; stop stays aligned
    order = np.argsort(new_pos[:, 0], kind="stable")
    return (GaussianMixture.from_arrays(new_pos[order], new_sca[order],
                                        new_rot[order], new_val[order],
                                        spec, min_capacity=mix.capacity),
            stop[order], n_split)


def split_gaussians_3d(mix: GaussianMixture, spec: FieldSpec,
                       rng: np.random.RandomState
                       ) -> Tuple[GaussianMixture, np.ndarray, int]:
    """Loop-until-none splitting, ratio >= 2 (reference
    3D/advance.py:61-87): the parent's shortest-scale axis gets += log 2,
    all axes -= log(2)/3, then two children copy the modified shape;
    children's positions are clamped to the padded domain."""
    m = mix.compact()
    pos = np.asarray(m.positions)
    sca = np.asarray(m.scalings)
    rot = np.asarray(m.rotations)
    val = np.asarray(m.values)
    stop = np.ones((pos.shape[0],), bool)
    total_split = 0
    lo = np.asarray(spec.lo, np.float32)
    hi = np.asarray(spec.hi, np.float32)
    while True:
        ratio = np.exp(sca.max(-1) - sca.min(-1))
        need = ratio >= 2.0
        n_split = int(need.sum())
        print(f"Add {n_split} particles. {float(ratio.max())}")
        if n_split == 0:
            break
        total_split += n_split
        axis_min = sca[need].argmin(-1)
        prec = np.asarray(precision_matrix(jnp.asarray(sca[need]),
                                           jnp.asarray(rot[need]), 3))
        child_pos = _sample_children(rng, pos[need], prec)
        child_pos = np.clip(child_pos, lo, hi)
        child_rot = np.tile(rot[need], (2, 1))
        mod = sca[need].copy()
        mod[np.arange(n_split), axis_min] += np.log(2.0)
        mod -= np.log(2.0) / 3.0
        child_sca = np.tile(mod, (2, 1))
        child_val = np.tile(val[need], (2, 1))
        pos = np.concatenate([pos[~need], child_pos])
        rot = np.concatenate([rot[~need], child_rot])
        sca = np.concatenate([sca[~need], child_sca])
        val = np.concatenate([val[~need], child_val])
        stop = np.concatenate([stop[~need],
                               np.zeros((2 * n_split,), bool)])
    if total_split == 0:
        # nothing split: skip the host-side rebuild/re-upload entirely
        return mix, stop, 0
    # canonical spatial sort (Morton in 3D — ops/spatial.py) for the
    # block-sparse backends; stop stays aligned
    order = np.argsort(spatial_ops.sort_key_np(pos), kind="stable")
    return (GaussianMixture.from_arrays(pos[order], sca[order], rot[order],
                                        val[order], spec,
                                        min_capacity=mix.capacity),
            stop[order], total_split)


def _unfreeze_neighbors(mix: GaussianMixture, spec: FieldSpec,
                        stop: np.ndarray) -> jnp.ndarray:
    """stop &= ~neighbors(new Gaussians) (reference 2D/advance.py:92)."""
    n = int(mix.n_alive())
    stop_full = np.zeros((mix.capacity,), bool)
    stop_full[:n] = stop
    free_pos = np.asarray(mix.positions)[:n][~stop]
    if free_pos.shape[0] == 0:
        return jnp.asarray(stop_full)
    radius = spec.max_reach(float(mix.min_scaling()))
    near = field.neighbor_mark(mix, spec, jnp.asarray(free_pos),
                               jnp.asarray(radius, jnp.float32))
    return jnp.asarray(stop_full) & ~near


_mixf = mixture_of

# Reference clone-fit early-stop thresholds and Adam lrs, shared with the
# multi-chip twin (parallel/driver.py) so the paths cannot drift.
PATIENCE_REL_CLONE = (1e-3, 1e-3)          # (val, grad)
DEFAULT_LRS_CLONE_2D = {"positions": 1e-2, "scalings": 5e-2,
                        "rotations": 5e-2, "values": 5e-3}  # 2D/advance.py:122
DEFAULT_LRS_CLONE_3D = {"positions": 1e-3, "scalings": 1e-3,
                        "rotations": 1e-3, "values": 1e-3}  # 3D/advance.py:121-124


@functools.lru_cache(maxsize=None)
def _clone_runner(spec: FieldSpec, batch_size: int,
                  target_grid: Optional[tuple]):
    """Cached jitted (chunk-runner, test-metrics) pair; the old field's
    parameters flow in as runtime data so frames don't recompile.

    ``target_grid`` enables the cached-target mode (same idea as the
    projection's, solver/project.py): the old field is frozen for the
    whole re-fit, so its (val, jac) targets are evaluated once on a grid
    and interpolated per epoch instead of re-evaluated."""
    d = spec.d
    nch = spec.vdim + spec.vdim * d   # [val, jac] channels

    def _interp(tgt, x, lo, hi):
        from gaussian_fluids_tpu.ops.interp import multi_channel_interp
        if d == 2:
            dom = (lo[0], hi[0], lo[1], hi[1])
        else:
            dom = (lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])
        out = multi_channel_interp(tgt, x, dom)
        ref_val = out[:, :spec.vdim]
        ref_jac = out[:, spec.vdim:].reshape(x.shape[0], spec.vdim, d)
        return ref_val, ref_jac

    def loss_fn(params, alive, stop, x, ref_val, ref_jac):
        frozen = losses.freeze_params(params, stop)
        val, jac = field.value_and_jac(_mixf(frozen, alive), spec, x,
                                       presorted=True, need_dx=False)
        l_val = losses.value_loss(val, ref_val)
        l_grad = losses.grad_loss(jac, ref_jac)
        l_aniso = losses.aniso_loss(params["scalings"], alive & ~stop)
        l_vol = losses.volume_loss(params["scalings"], alive,
                                   detach_mask=stop)
        total = l_val + l_grad + l_aniso + l_vol
        return total, jnp.stack([l_val, l_grad, l_aniso, l_vol])

    def epoch(carry, xs):
        # xs is a tuple when run_chunk hoisted the chunk's sample batches
        # and exact old-field targets out of the scan (the Pallas regime;
        # bitwise-identical math, see solver/project.py run_chunk), a
        # bare key otherwise.
        hoisted = isinstance(xs, tuple)
        if hoisted:
            key, x, ref_val, ref_jac = xs
        else:
            key = xs
        if target_grid is not None:
            (params, opt_state, alive, stop, old_params, old_alive,
             lo, hi, tgt) = carry
        else:
            (params, opt_state, alive, stop, old_params, old_alive,
             lo, hi) = carry
        if not hoisted:
            x = jax.random.uniform(key, (batch_size, d), jnp.float32) \
                * (hi - lo) + lo
            if field._use_pallas(batch_size, params["positions"].shape[0]):
                # canonical spatial key (Morton in 3D; ops/spatial.py)
                x = x[jnp.argsort(spatial_ops.sort_key(x, lo, hi))]
                # (dense backend ignores the hint — skip the pure-overhead
                # sort)
            if target_grid is not None:
                ref_val, ref_jac = _interp(tgt, x, lo, hi)
            else:
                ref_val, ref_jac = field.value_and_jac(
                    _mixf(old_params, old_alive), spec, x, presorted=True)
        ref_val = jax.lax.stop_gradient(ref_val)
        ref_jac = jax.lax.stop_gradient(ref_jac)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, alive, stop, x, ref_val, ref_jac)
        params, opt_state = optim.step(opt_state, params, grads, total)
        out = (params, opt_state, alive, stop, old_params, old_alive,
               lo, hi)
        if target_grid is not None:
            out = out + (tgt,)
        return out, aux

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        keys = jax.random.split(key, n)
        params = carry[0]
        old_params, old_alive, lo, hi = carry[4], carry[5], carry[6], \
            carry[7]
        if (target_grid is not None
                or os.environ.get("GF_HOIST_TARGETS", "1") == "0"
                or not (field._use_pallas(
                        batch_size, params["positions"].shape[0])
                        or field._use_sparse(
                            batch_size, params["positions"].shape[0],
                            spec.d))):
            return jax.lax.scan(epoch, carry, keys)
        # Exact-target hoist (Pallas regime): the old field is frozen for
        # the whole re-fit, so the chunk's [val, jac] targets come from a
        # few big batched sweeps instead of one small eval per epoch —
        # bitwise-identical, pure launch amortization (see
        # solver/project.py run_chunk).
        from gaussian_fluids_tpu.utils.grids import sweep_group
        old_mix = _mixf(old_params, old_alive)
        data = jax.vmap(
            lambda k: jax.random.uniform(k, (batch_size, d), jnp.float32)
            * (hi - lo) + lo)(keys)
        data = jax.vmap(lambda x: x[jnp.argsort(
            spatial_ops.sort_key(x, lo, hi))])(data)
        g = sweep_group(n, batch_size)
        rv, rj = jax.lax.map(
            lambda c: field.value_and_jac(old_mix, spec, c, presorted=True,
                                          need_dx=False),
            data.reshape(n // g, g * batch_size, d))
        return jax.lax.scan(
            epoch, carry,
            (keys, data, rv.reshape((n, batch_size) + rv.shape[2:]),
             rj.reshape((n, batch_size) + rj.shape[2:])))

    def _pad_chunks(test_x, b):
        return pad_chunks(test_x, d, b)

    @jax.jit
    def target_grid_fn(old_params, old_alive, lo, hi):
        """Old-field [val, jac] channels on a target_grid-shaped grid over
        (lo, hi) — computed once per clone (the old field is frozen)."""
        old_mix = _mixf(old_params, old_alive)
        axes = [jnp.linspace(0.0, 1.0, r, dtype=jnp.float32)
                for r in target_grid]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        pts = lo + jnp.stack(mesh, -1).reshape(-1, d) * (hi - lo)
        # axis-0-major flatten -> nondecreasing coordinate 0 -> presorted
        pts_c, _ = pad_chunks(pts, d, pts.shape[0])

        def one(c):
            v, j = field.value_and_jac(old_mix, spec, c, presorted=True)
            return jnp.concatenate([v, j.reshape(c.shape[0], -1)], -1)

        out = jax.lax.map(one, pts_c).reshape(-1, nch)[: pts.shape[0]]
        return out.reshape(target_grid + (nch,))

    @jax.jit
    def test_ref_fn(old_params, old_alive, test_x):
        """Old-field (val, jac) targets on the test grid — constant over
        the whole clone fit, computed once."""
        old_mix = _mixf(old_params, old_alive)
        xc, _ = _pad_chunks(test_x, test_x.shape[0])
        return jax.lax.map(
            lambda c: field.value_and_jac(old_mix, spec, c, presorted=True),
            xc)

    @jax.jit
    def test_fn(params, alive, stop, test_x, test_ref):
        mix = _mixf(params, alive)
        rv_all, rj_all = test_ref
        b = test_x.shape[0]
        xcs, valid = _pad_chunks(test_x, b)

        def one(args):
            xc, rv, rj, vc = args
            v, j = field.value_and_jac(mix, spec, xc, presorted=True)
            lv = (jnp.abs(v - rv).mean(-1) * vc).sum()
            lg = (jnp.abs(j - rj).mean((-1, -2)) * vc).sum()
            return jnp.stack([lv, lg])

        out = jax.lax.map(one, (xcs, rv_all, rj_all, valid))
        # raw regularizer values for the reference's test line (aniso over
        # the unfrozen set, volume over all alive — 2D/advance.py:109-117,
        # printed unweighted at :133,157)
        la = losses.aniso_loss(params["scalings"], alive & ~stop)
        lvl = losses.volume_loss(params["scalings"], alive)
        return out[:, 0].sum() / b, out[:, 1].sum() / b, la, lvl

    return run_chunk, test_ref_fn, test_fn, target_grid_fn


def clone_velocity_field(old_mix: GaussianMixture, spec: FieldSpec, *,
                         lo, hi, test_x, key, seed: int = 0, d: int = 2,
                         lrs: Optional[Dict[str, float]] = None,
                         batch_size: int = 512, max_epoch: int = 3000,
                         patience: int = 500, check_iter: int = 100,
                         verbose: int = 1,
                         target_grid_res: int = 0) -> GaussianMixture:
    """Full clone: split + freeze + re-fit to the old field (reference
    2D/advance.py:58-158). Returns the new mixture (possibly with more
    Gaussians).

    ``target_grid_res`` > 0 enables the cached-target mode: the frozen old
    field's [val, jac] targets are evaluated once on a res^d grid over
    (lo, hi) and interpolated per epoch (opt-in speed/accuracy trade; test
    metrics are always computed against the exact old field)."""
    rng = np.random.RandomState(seed)
    test_x_s = jnp.asarray(test_x)
    test_x_s = test_x_s[jnp.argsort(test_x_s[:, 0])]  # presorted test chunks
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
        print(f"[clone] Add {n_split} particles.")

    tg = (int(target_grid_res),) * d if target_grid_res else None
    run_chunk, test_ref_fn, test_fn, target_grid_fn = _clone_runner(
        spec, batch_size, tg)

    # the old field may live in a smaller padding bucket than the split
    # result; repad it to the same capacity so both flow through one jit
    old_padded = _repad_like(old_mix, new_mix.capacity, spec)

    params = new_mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    lo_j = jnp.asarray(lo, jnp.float32)
    hi_j = jnp.asarray(hi, jnp.float32)
    carry = (params, opt_state, new_mix.alive, stop, old_padded.params(),
             old_padded.alive, lo_j, hi_j)
    if tg is not None:
        carry = carry + (target_grid_fn(old_padded.params(),
                                        old_padded.alive, lo_j, hi_j),)
    test_ref = test_ref_fn(old_padded.params(), old_padded.alive, test_x_s)

    def metrics(c):
        return jax.device_get(test_fn(c[0], c[2], c[3], test_x_s, test_ref))

    if verbose:
        lv, lg, la, lvl = metrics(carry)
        print(f"[clone] loss: {lv}, loss_grad: {lg}, loss_aniso: {la}, "
              f"loss_vol: {lvl}")

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
            print(f"[clone] loss: {lv}, loss_grad: {lg}, loss_aniso: {la}, "
                  f"loss_vol: {lvl}, time: {time.time() - st}")
            st = time.time()
        pat_v.update(float(lv), n)
        pat_g.update(float(lg), n)
        return pat_v.iters >= patience and pat_g.iters >= patience

    carry, _ = run_chunked(carry, dispatch, max_epoch, check_iter,
                           on_chunk, "clone")
    return new_mix.with_params(carry[0])
