"""2D end-to-end flows: initialization and the frame loop.

Reference call stacks: SimulationInitialize (2D/initialize.py:187-238),
init_karman_velocity (2D/initialize.py:162-185) and the advance __main__
frame loop clone -> advect -> project -> save (2D/advance.py:304-365).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.io import checkpoint
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.solver import losses
from gaussian_fluids_tpu.solver.advect_field import advect_covector_field_2d
from gaussian_fluids_tpu.utils import analysis
from gaussian_fluids_tpu.solver.clone import clone_velocity_field
from gaussian_fluids_tpu.solver.fit import fit_velocity_with_gradient
from gaussian_fluids_tpu.solver.project import ProjectWeights, project_2d
from gaussian_fluids_tpu.utils.grids import grid_points_2d
from gaussian_fluids_tpu.utils import rng

LR_RATIO = 1.201956  # reference 2D/initialize.py:118,163


@functools.lru_cache(maxsize=None)
def _scene_eval(scene_name: str):
    """Jitted analytic-field evaluators (value, jac) for viz sweeps —
    eager dispatch is prohibitively slow on the tunneled TPU runtime."""
    scene = get_scene_2d(scene_name)
    return jax.jit(scene.velocity), jax.jit(scene.velocity_jac)


class _HostMix:
    """Pure-numpy snapshot of the alive rows, quacking enough like
    GaussianMixture for viz2d.draw_ellipses — so the render worker never
    touches the device (its ``compact()`` is a no-op on itself)."""

    def __init__(self, mix):
        keep = np.asarray(mix.alive)
        self.positions = np.asarray(mix.positions)[keep]
        self.scalings = np.asarray(mix.scalings)[keep]
        self.rotations = np.asarray(mix.rotations)[keep]
        self.values = np.asarray(mix.values)[keep]

    def compact(self):
        return self


_RENDER_POOL = None
_RENDER_PENDING: "deque" = None


def _viz_submit(fn):
    """Run ``fn`` on the single background render worker, bounded at 2
    outstanding frames (backpressure keeps memory flat and a crash loses
    at most 2 frames' PNGs — advance_2d backfills them on resume).
    Worker exceptions re-raise here at the next submit/flush."""
    global _RENDER_POOL, _RENDER_PENDING
    if _RENDER_POOL is None:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        _RENDER_POOL = ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix="viz-render")
        _RENDER_PENDING = deque()
    while len(_RENDER_PENDING) >= 2:
        _RENDER_PENDING.popleft().result()
    _RENDER_PENDING.append(_RENDER_POOL.submit(fn))


def flush_viz():
    """Block until every queued render finished (end of the frame loop)."""
    while _RENDER_PENDING:
        _RENDER_PENDING.popleft().result()


def _viz_frame(out_dir, tag, mix, spec, scene, asynchronous=False):
    """The reference's four per-frame PNGs (2D/advance.py:347-350).

    The device sweeps run in the CALLER's thread (single-threaded device
    dispatch — the tunneled client's thread-safety is unproven), with the
    vorticity and divergence heatmaps sharing ONE Jacobian sweep. The
    matplotlib rendering — the bulk of the ~2 s/frame — goes to the
    background render worker when ``asynchronous`` (production frame
    loop); PNG bytes are identical either way."""
    from gaussian_fluids_tpu.io import viz2d
    sf = scene.scaling_factor
    x0i, x1i, y0i, y1i = scene.initialize_domain
    x0v, x1v, y0v, y1v = scene.visualize_domain
    xnv, ynv = scene.visualize_res

    g_i = np.asarray(grid_points_2d(x0i * sf, x1i * sf, y0i * sf, y1i * sf,
                                    30, 30))
    g_v = np.asarray(grid_points_2d(x0v, x1v, y0v, y1v, 30, 30))
    g_r = np.asarray(grid_points_2d(x0v, x1v, y0v, y1v, xnv, ynv))
    vel_i = np.asarray(field.eval_on_grid(mix, spec, g_i)[0])
    vel_v = np.asarray(field.eval_on_grid(mix, spec, g_v * sf)[0]) / sf
    jac_r = np.asarray(field.eval_on_grid(mix, spec, g_r * sf)[1])
    vor = analysis.curl2d_np(jac_r)
    div = analysis.divergence_np(jac_r)
    host_mix = _HostMix(mix)  # ellipse overlay data, fetched here

    def render():
        viz2d.show_field(lambda x: vel_i, x0i * sf, x1i * sf, y0i * sf,
                         y1i * sf, dim=2, x_n=30, y_n=30,
                         additional_drawing=lambda: viz2d.draw_ellipses(
                             host_mix),
                         save_filename=os.path.join(out_dir, f"{tag}.png"))
        viz2d.show_field(lambda x: vel_v, x0v, x1v, y0v, y1v, dim=2,
                         x_n=30, y_n=30,
                         save_filename=os.path.join(out_dir,
                                                    f"clean_{tag}.png"))
        viz2d.show_field(lambda x: vor, x0v, x1v, y0v, y1v, x_n=xnv,
                         y_n=ynv,
                         save_filename=os.path.join(out_dir,
                                                    f"vorticity_{tag}.png"))
        viz2d.show_field(lambda x: div, x0v, x1v, y0v, y1v, x_n=xnv,
                         y_n=ynv,
                         save_filename=os.path.join(
                             out_dir, f"divergence_{tag}.png"))

    if asynchronous:
        _viz_submit(render)
    else:
        render()


def initialize_2d(init_cond: str, out_dir: str, max_epoch: int = 10000,
                  batch_size: int = 512, seed: int = 42,
                  viz: bool = True, particle_count=None, verbose: int = 1):
    """Initial fitting entry point (reference 2D/initialize.py:187-238)."""
    os.makedirs(out_dir, exist_ok=True)
    scene = get_scene_2d(init_cond)
    sf = scene.scaling_factor
    x0, x1, y0, y1 = scene.initialize_domain
    lo = (x0 * sf, y0 * sf)
    hi = (x1 * sf, y1 * sf)
    x_n, y_n = particle_count or scene.particle_count

    pos = grid_points_2d(lo[0], hi[0], lo[1], hi[1], x_n, y_n)
    spec = FieldSpec.create(lo, hi, pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec).spatially_sorted()
    print(f"Particle count: {pos.shape[0]} ({x_n} x {y_n})")

    key = jax.random.PRNGKey(seed)
    if viz:
        from gaussian_fluids_tpu.io import viz2d
        xnv, ynv = scene.visualize_res
        vel_fn, jac_fn = _scene_eval(init_cond)
        viz2d.show_field(lambda x: np.asarray(vel_fn(jnp.asarray(x))),
                         x0, x1, y0, y1, dim=2, x_n=30, y_n=30,
                         save_filename=os.path.join(out_dir,
                                                    "refvelocity.png"))
        viz2d.show_field(lambda x: np.asarray(losses.curl2d(
            jac_fn(jnp.asarray(x)))), x0, x1, y0, y1, x_n=xnv, y_n=ynv,
            save_filename=os.path.join(out_dir, "refvorticity.png"))
        viz2d.show_field(lambda x: np.asarray(losses.divergence(
            jac_fn(jnp.asarray(x)))), x0, x1, y0, y1, x_n=xnv, y_n=ynv,
            save_filename=os.path.join(out_dir, "refdivergence.png"))

    if init_cond == "karman":
        mix = _init_karman(mix, spec, scene, key, max_epoch, batch_size,
                           verbose)
    else:
        # reference 2D/initialize.py:225-226
        mix = fit_velocity_with_gradient(
            mix, spec, scene.target_velocity, scene.target_velocity_jac,
            lo, hi,
            lrs={"positions": 1.6e-3, "scalings": 5e-2, "rotations": 5e-2,
                 "values": 5e-3},
            batch_size=batch_size, max_epoch=max_epoch, key=key,
            verbose=verbose)

    checkpoint.save_checkpoint(
        os.path.join(out_dir, "gaussian_velocity_0.pt"), mix, spec)
    if viz:
        _viz_frame(out_dir, "0", mix, spec, scene)
    return mix, spec


def _init_karman(mix, spec, scene, key, max_epoch, batch_size, verbose):
    """Karman special init: fit uniform inflow, then a zero-dt projection
    against a frozen copy carves the cylinder (reference
    2D/initialize.py:162-185)."""
    sf = scene.scaling_factor
    x0, x1, y0, y1 = scene.initialize_domain
    lo, hi = (x0 * sf, y0 * sf), (x1 * sf, y1 * sf)
    key, k1, k2 = rng.split3(key)
    mix = fit_velocity_with_gradient(
        mix, spec, scene.target_velocity, scene.target_velocity_jac, lo, hi,
        lrs={"positions": 1.6e-3, "scalings": 5e-3,
             "rotations": 5e-3 * LR_RATIO, "values": 5e-3},
        batch_size=batch_size, max_epoch=max_epoch, key=k1, verbose=verbose)
    frozen = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                             mix.values, mix.alive)
    xnv, ynv = scene.visualize_res
    adv = scene.advance_domain
    test_x = jnp.asarray(grid_points_2d(
        adv[0] * sf, adv[1] * sf, adv[2] * sf, adv[3] * sf, xnv, ynv))
    return project_2d(
        mix, spec, frozen, 0.0, scene=scene, adv_domain=adv, test_x=test_x,
        key=k2,
        weights=ProjectWeights(vor=1.0, div=10.0, aniso=10.0, vol=10.0,
                               delta_pos=0.0),
        boundary_lambda=10.0,
        lrs={"positions": 1e-4, "scalings": 1e-5,
             "rotations": 1e-5 * LR_RATIO, "values": 1e-4},
        batch_size=batch_size, max_epoch=min(10000, max_epoch),
        patience=10000, verbose=verbose)


def advance_2d(init_cond: str, out_dir: str, dt: float, last_time: float,
               start_frame: int = 0, max_epoch: int = 20000,
               batch_size: int = 512, seed: int = 42, viz: bool = True,
               verbose: int = 1, test_res: Optional[tuple] = None,
               target_grid_res: int = 0,
               mesh_shape: Optional[tuple] = None):
    """Frame loop (reference 2D/advance.py:304-365).

    ``mesh_shape`` = (n_batch, n_gauss) routes every clone re-fit and
    projection epoch through the dp x tp sharded runners
    (parallel/driver.py) over a Mesh of the first n_batch*n_gauss local
    devices; the sharded epoch evaluates exact per-epoch targets, so it is
    mutually exclusive with ``target_grid_res``.
    """
    mesh = None
    if mesh_shape is not None:
        from gaussian_fluids_tpu.parallel import mesh_from_shape
        mesh = mesh_from_shape(mesh_shape, target_grid_res)
    scene = get_scene_2d(init_cond)
    sf = scene.scaling_factor
    adv_domain = scene.advance_domain_at(start_frame, dt)
    ckpt = os.path.join(out_dir, f"gaussian_velocity_{start_frame}.pt")
    mix, spec = checkpoint.load_checkpoint(ckpt)
    key = jax.random.PRNGKey(seed + start_frame)

    xnv, ynv = test_res or scene.visualize_res

    def test_grid(adv):
        return jnp.asarray(grid_points_2d(
            adv[0] * sf, adv[1] * sf, adv[2] * sf, adv[3] * sf, xnv, ynv))

    if viz:
        # backfill PNGs a crashed run's async renderer never wrote (at
        # most the 2 outstanding frames before the crash)
        for k in range(max(0, start_frame - 2), start_frame):
            ck = os.path.join(out_dir, f"gaussian_velocity_{k}.pt")
            if (os.path.exists(ck) and not os.path.exists(
                    os.path.join(out_dir, f"divergence_{k}.png"))):
                m_k, _ = checkpoint.load_checkpoint(ck)
                _viz_frame(out_dir, str(k), m_k, spec, scene)
        _viz_frame(out_dir, str(start_frame), mix, spec, scene)

    t, cnt = 0.0, start_frame + 1
    while t < last_time:
        ft0 = time.perf_counter()
        key, kc, kp = rng.split3(key)
        adv_lo = (adv_domain[0] * sf, adv_domain[2] * sf)
        adv_hi = (adv_domain[1] * sf, adv_domain[3] * sf)
        if mesh is None:
            new_mix = clone_velocity_field(
                mix, spec, lo=adv_lo, hi=adv_hi,
                test_x=test_grid(adv_domain), key=kc, seed=cnt, d=2,
                max_epoch=max_epoch, verbose=verbose,
                target_grid_res=target_grid_res)
        else:
            from gaussian_fluids_tpu.parallel.driver import \
                clone_velocity_field_sharded
            new_mix = clone_velocity_field_sharded(
                mix, spec, mesh=mesh, lo=adv_lo, hi=adv_hi,
                test_x=test_grid(adv_domain), key=kc, seed=cnt, d=2,
                batch_size=batch_size, max_epoch=max_epoch, verbose=verbose)
        ftc = time.perf_counter()
        new_mix = advect_covector_field_2d(new_mix, spec, dt)
        adv_domain = scene.extra_advect(adv_domain, dt)
        fta = time.perf_counter()
        w = ProjectWeights(vor=1.0, div=1.0, aniso=10.0, vol=10.0,
                           delta_pos=0.5)
        if mesh is None:
            new_mix = project_2d(
                new_mix, spec, mix, dt, scene=scene, adv_domain=adv_domain,
                test_x=test_grid(adv_domain), key=kp, weights=w,
                boundary_lambda=1.0, batch_size=batch_size,
                max_epoch=max_epoch, verbose=verbose,
                target_grid_res=target_grid_res)
        else:
            from gaussian_fluids_tpu.parallel.driver import project_2d_sharded
            new_mix = project_2d_sharded(
                new_mix, spec, mix, dt, mesh=mesh, scene=scene,
                adv_domain=adv_domain, test_x=test_grid(adv_domain), key=kp,
                weights=w, boundary_lambda=1.0, batch_size=batch_size,
                max_epoch=max_epoch, verbose=verbose)
        mix = new_mix
        ft1 = time.perf_counter()
        if viz:
            _viz_frame(out_dir, str(cnt), mix, spec, scene,
                       asynchronous=True)
        ft2 = time.perf_counter()
        checkpoint.save_checkpoint(
            os.path.join(out_dir, f"gaussian_velocity_{cnt}.pt"), mix, spec)
        if verbose:
            ft3 = time.perf_counter()
            print(f"[frame {cnt}] solve {ft1 - ft0:.1f}s (clone "
                  f"{ftc - ft0:.1f} advect {fta - ftc:.1f} project "
                  f"{ft1 - fta:.1f}) viz {ft2 - ft1:.1f}s save "
                  f"{ft3 - ft2:.1f}s (N={int(mix.n_alive())}/"
                  f"{mix.capacity})", flush=True)
        cnt += 1
        t += dt
    if viz:
        flush_viz()
    return mix, spec
