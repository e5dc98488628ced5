"""3D end-to-end flows: initialization, the frame loop, and the offline
smoke-density pipeline (reference 3D/initialize.py, 3D/advance.py:334-393,
3D/advance_density.py)."""

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
from gaussian_fluids_tpu.ops import field, interp
from gaussian_fluids_tpu.io import checkpoint, vti
from gaussian_fluids_tpu.scenes import get_scene_3d
from gaussian_fluids_tpu.solver import losses
from gaussian_fluids_tpu.solver.advect_field import advect_covector_field_3d
from gaussian_fluids_tpu.solver.clone import clone_velocity_field
from gaussian_fluids_tpu.solver.fit import fit_velocity_with_gradient
from gaussian_fluids_tpu.solver.project import ProjectWeights, project_3d
from gaussian_fluids_tpu.utils.grids import grid_points_3d
from gaussian_fluids_tpu.utils import analysis, rng


def _vorticity_mag_fn(mix, spec):
    def f(x):
        j = field.eval_on_grid(mix, spec, x)[1]
        return np.linalg.norm(analysis.curl3d_np(j), axis=-1)
    return f


def _divergence_fn(mix, spec):
    def f(x):
        j = field.eval_on_grid(mix, spec, x)[1]
        return analysis.divergence_np(j)
    return f


def _write_frame_vti(out_dir, tag, mix, spec, scene, viz_res=None):
    xn, yn, zn = viz_res or scene.visualize_res
    vti.write_vti_field(_vorticity_mag_fn(mix, spec), scene.domain,
                        os.path.join(out_dir, f"vorticity_{tag}.vti"),
                        x_n=xn, y_n=yn, z_n=zn)
    vti.write_vti_field(_divergence_fn(mix, spec), scene.domain,
                        os.path.join(out_dir, f"divergence_{tag}.vti"),
                        x_n=xn, y_n=yn, z_n=zn)


def _plot_loss_curves(curves, path):
    """Per-frame 2x2 loss-curve figure (reference 3D/advance.py:317-331):
    train vor (+ log lr twin axis), train div, test vor, test div."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _, axs = plt.subplots(2, 2, figsize=(12, 10))
    axs[0, 0].plot(curves["train_vor"])
    axs[0, 0].twinx().plot(curves["log_lr"], color="orange")
    axs[0, 0].set_title("Vorticity training loss")
    axs[0, 1].plot(curves["train_div"])
    axs[0, 1].set_title("Divergence training loss")
    axs[1, 0].plot(curves["test_vor"])
    axs[1, 0].set_title("Vorticity test loss")
    axs[1, 1].plot(curves["test_div"])
    axs[1, 1].set_title("Divergence test loss")
    plt.tight_layout()
    plt.savefig(path)
    plt.close("all")


def initialize_3d(init_cond: str, out_dir: str, max_epoch: int = 500,
                  batch_size: int = 8192, seed: int = 42, viz: bool = True,
                  particle_count=None, viz_res=None, verbose: int = 1):
    """Initial fitting (reference 3D/initialize.py:49-100)."""
    os.makedirs(out_dir, exist_ok=True)
    scene = get_scene_3d(init_cond)
    x_min, x_max, y_min, y_max, z_min, z_max = scene.domain
    lo = (x_min, y_min, z_min)
    hi = (x_max, y_max, z_max)
    xn, yn, zn = particle_count or scene.particle_count
    pos = grid_points_3d(*scene.domain, xn, yn, zn)
    spec = FieldSpec.create(lo, hi, pos.shape[0], d=3, vdim=3)
    mix = GaussianMixture.create(pos, spec).spatially_sorted()
    print("Particle count:", pos.shape[0])
    if scene.mesh_sampler is not None:
        scene.mesh_sampler.save_obj(os.path.join(out_dir, "obstacle.obj"))

    if viz:
        vxn, vyn, vzn = viz_res or scene.visualize_res
        # jitted: eager dispatch is prohibitively slow on the TPU tunnel
        vel_j = jax.jit(scene.velocity)
        jac_j = jax.jit(scene.velocity_jac)
        vel_mag = lambda x: np.asarray(jnp.linalg.norm(
            vel_j(jnp.asarray(x)), axis=-1))
        vor_mag = lambda x: np.asarray(jnp.linalg.norm(losses.curl3d(
            jac_j(jnp.asarray(x))), axis=-1))
        div_ref = lambda x: np.asarray(losses.divergence(
            jac_j(jnp.asarray(x))))
        hel_ref = lambda x: np.asarray(jnp.sum(
            losses.curl3d(jac_j(jnp.asarray(x)))
            * vel_j(jnp.asarray(x)), axis=-1))
        for name, fn in (("velocity_ref", vel_mag), ("vorticity_ref",
                                                     vor_mag),
                         ("divergence_ref", div_ref),
                         ("helicity_ref", hel_ref)):
            vti.write_vti_field(fn, scene.domain,
                                os.path.join(out_dir, f"{name}.vti"),
                                x_n=vxn, y_n=vyn, z_n=vzn)

    key = jax.random.PRNGKey(seed)
    # reference 3D/GSR.py:156 Fast defaults: all group lrs 1e-3
    mix = fit_velocity_with_gradient(
        mix, spec, scene.velocity, scene.velocity_jac, lo, hi,
        lrs={"positions": 1e-3, "scalings": 1e-3, "rotations": 1e-3,
             "values": 1e-3},
        batch_size=batch_size, max_epoch=max_epoch, key=key, verbose=verbose)

    checkpoint.save_checkpoint(
        os.path.join(out_dir, "gaussian_velocity_0.pt"), mix, spec)
    if viz:
        _write_frame_vti(out_dir, "0", mix, spec, scene, viz_res)
    return mix, spec


def advance_3d(init_cond: str, out_dir: str, dt: float, last_time: float,
               start_frame: int = 0, max_epoch: int = 20000,
               batch_size: int = 8192, boundary_lambda: float = 10.0,
               seed: int = 42, viz: bool = True, viz_res=None,
               test_res: Optional[tuple] = None, verbose: int = 1,
               target_grid_res: int = 0,
               mesh_shape: Optional[tuple] = None):
    """Frame loop (reference 3D/advance.py:334-393).

    ``mesh_shape`` = (n_batch, n_gauss) routes every clone re-fit and
    projection epoch through the dp x tp sharded runners
    (parallel/driver.py); the sharded projection does not collect the
    per-epoch loss curves, so the loss_{frame}.png plots are skipped."""
    mesh = None
    if mesh_shape is not None:
        from gaussian_fluids_tpu.parallel import mesh_from_shape
        mesh = mesh_from_shape(mesh_shape, target_grid_res)
    scene = get_scene_3d(init_cond)
    domain = scene.domain
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    lo = (x_min, y_min, z_min)
    hi = (x_max, y_max, z_max)
    ckpt = os.path.join(out_dir, f"gaussian_velocity_{start_frame}.pt")
    mix, spec = checkpoint.load_checkpoint(ckpt)
    key = jax.random.PRNGKey(seed + start_frame)

    xnv, ynv, znv = test_res or scene.visualize_res
    test_x = jnp.asarray(grid_points_3d(*domain, xnv, ynv, znv))

    if viz:
        _write_frame_vti(out_dir, str(start_frame), mix, spec, scene,
                         viz_res)

    t, cnt = 0.0, start_frame + 1
    while t < last_time:
        ft0 = time.perf_counter()
        key, kc, kp = rng.split3(key)
        if mesh is None:
            new_mix = clone_velocity_field(
                mix, spec, lo=lo, hi=hi, test_x=test_x, key=kc, seed=cnt,
                d=3, batch_size=batch_size, max_epoch=max_epoch,
                verbose=verbose, target_grid_res=target_grid_res)
        else:
            from gaussian_fluids_tpu.parallel.driver import \
                clone_velocity_field_sharded
            new_mix = clone_velocity_field_sharded(
                mix, spec, mesh=mesh, lo=lo, hi=hi, test_x=test_x, key=kc,
                seed=cnt, d=3, batch_size=batch_size, max_epoch=max_epoch,
                verbose=verbose)
        new_mix = advect_covector_field_3d(new_mix, mix, spec, dt)
        w = ProjectWeights(vor=1.0, div=1.0, aniso=10.0, vol=10.0,
                           delta_pos=0.0, hel=1.0, val_reg=0.0)
        if mesh is None:
            res = project_3d(
                new_mix, spec, mix, dt, domain=domain, test_x=test_x,
                key=kp, scene_name=init_cond, weights=w,
                boundary_lambda=boundary_lambda, batch_size=batch_size,
                max_epoch=max_epoch, verbose=verbose, collect_curves=viz,
                target_grid_res=target_grid_res)
        else:
            from gaussian_fluids_tpu.parallel.driver import project_3d_sharded
            res = project_3d_sharded(
                new_mix, spec, mix, dt, mesh=mesh, domain=domain,
                test_x=test_x, key=kp, scene_name=init_cond, weights=w,
                boundary_lambda=boundary_lambda, batch_size=batch_size,
                max_epoch=max_epoch, verbose=verbose)
        if viz and mesh is None:
            new_mix, curves = res
            _plot_loss_curves(curves, os.path.join(out_dir,
                                                   f"loss_{cnt}.png"))
        else:
            new_mix = res
        mix = new_mix
        print(f"Wrote frame {cnt}")
        ft1 = time.perf_counter()
        if viz:
            _write_frame_vti(out_dir, str(cnt), mix, spec, scene, viz_res)
        ft2 = time.perf_counter()
        checkpoint.save_checkpoint(
            os.path.join(out_dir, f"gaussian_velocity_{cnt}.pt"), mix, spec)
        if verbose:
            ft3 = time.perf_counter()
            print(f"[frame {cnt}] solve {ft1 - ft0:.1f}s viz "
                  f"{ft2 - ft1:.1f}s save {ft3 - ft2:.1f}s "
                  f"(N={int(mix.n_alive())}/{mix.capacity})", flush=True)
        cnt += 1
        t += dt
    return mix, spec


# ---- offline smoke rendering (reference 3D/advance_density.py) ----

@functools.lru_cache(maxsize=2)
def _grid_pts_padded(domain: tuple, grid_shape: tuple, chunk: int):
    """(pts padded to a whole number of chunks, true count). The 512^3
    node grid is 1.6 GB of host meshgrid — constant across frames and
    densities, so build it once (it was ~2 min of single-core numpy PER
    advected_density call)."""
    xn, yn, zn = grid_shape
    pts = np.asarray(grid_points_3d(*domain, xn, yn, zn))
    n = pts.shape[0]
    pad = (-n) % chunk
    # pad by replicating the last node: grid_points_3d is x-slowest, so the
    # whole padded array stays globally sorted by x and the banded sweep
    # can run presorted with no per-chunk argsort (padded outputs are
    # discarded by the caller).
    return np.concatenate([pts, np.repeat(pts[-1:], pad, 0)]), n


@functools.lru_cache(maxsize=4)
def _grid_chunks_device(domain: tuple, grid_shape: tuple, chunk: int,
                        sharding=None):
    """Device-resident query-point chunks for the density sweep. The grid
    nodes are constant across frames AND densities, but uploading them per
    sweep cost 1.6 GB of host->device traffic per density at 512^3 — ~3 min
    per density on the ~8 MB/s tunneled runtime, the single largest term of
    the replay frame time. Upload once per process and reuse. ``sharding``
    (a hashable jax.sharding.Sharding) lays each chunk onto a mesh for the
    multi-chip sweep (parallel/density.py)."""
    pts_p, n = _grid_pts_padded(domain, grid_shape, chunk)
    chunks = [jax.device_put(pts_p[i:i + chunk], sharding)
              for i in range(0, pts_p.shape[0], chunk)]
    return chunks, n


def _suggest_band(mix, spec, dt, tb: int = 1024, tn: int = 512,
                  chunk: int = 262144) -> int:
    """Host-side static band width for field.value_banded: the widest
    x-window of Gaussian tiles any query tile can overlap, with a drift
    margin covering the RK4 stage excursions. Bucketed to multiples of 8 so
    recompiles are rare. ``tb``/``tn``/``chunk`` must match the values the
    banded evaluation is called with."""
    from gaussian_fluids_tpu.ops import field as field_ops
    mu = np.asarray(mix.positions)
    dead = ~np.asarray(field_ops.in_domain_mask(mix, spec))
    cap = mix.capacity
    pad = (-cap) % tn
    mu0 = np.concatenate([mu[:, 0], np.zeros(pad, np.float32)])
    deadp = np.concatenate([dead, np.ones(pad, bool)])
    r = np.asarray(field_ops.support_radius(mix.scalings,
                                            spec.clamp_threshold))
    rp = np.concatenate([r, np.zeros(pad, np.float32)])
    nnt = (cap + pad) // tn
    mu0 = mu0.reshape(nnt, tn)
    deadp = deadp.reshape(nnt, tn)
    rp = np.where(deadp, 0.0, rp.reshape(nnt, tn)).max(1)
    nlo = np.where(deadp, np.inf, mu0).min(1) - rp
    nhi = np.where(deadp, -np.inf, mu0).max(1) + rp
    L = max(spec.hi[i] - spec.lo[i] for i in range(spec.d))
    # query tile x-width: a tile of tb of a `chunk`-point coordinate-sorted
    # batch spans ~tb/chunk of the domain for near-uniform points; allow 4x
    # non-uniformity slop. The drift margin covers RK4 stage excursions for
    # the O(1)-velocity flows of this framework (|u| dt << 0.05 L).
    margin = 0.05 * L + 2.0 * abs(float(dt))
    wB = min(L, 4.0 * L * tb / chunk) + margin
    # widest window: for every possible query interval [a, a+wB], count
    # overlapping tiles; scan tile edges as candidate interval starts
    starts = np.concatenate([nlo, nhi]) - wB
    cnt = (nhi[None, :] >= starts[:, None]) \
        & (nlo[None, :] <= (starts + wB)[:, None])
    width = 1
    for row in cnt:
        idx = np.nonzero(row)[0]
        if idx.size:
            width = max(width, int(idx[-1] - idx[0] + 1))
    width = min(nnt, width + 2)
    return min(nnt, ((width + 7) // 8) * 8)


def advected_density(density, mix, spec, domain, dt, grid_shape,
                     chunk: int = 262144):
    """One semi-Lagrangian step: RK4-backtrace every grid node through the
    velocity field, clamp, and trilinearly sample the old density
    (reference 3D/advance_density.py:52-59).

    Backend: the banded value-only Pallas kernel on TPU (grid nodes are
    spatially coherent, so each query tile visits only a static window of
    Gaussian tiles; the (B, N) kernel matrix never materializes); the
    dense masked sweep on CPU with an N-bounded chunk (Pallas interpret
    mode and the XLA gather-culled path are both far slower there)."""
    xn, yn, zn = grid_shape
    use_pallas = jax.default_backend() in ("tpu", "axon")
    args = (mix.params(), mix.alive)
    if use_pallas:
        band = _suggest_band(mix, spec, dt, chunk=chunk)
        # grid chunks are x-sorted by construction -> skip the argsort
        step_chunk = _density_step_pallas(spec, tuple(domain), band,
                                          sorted_input=True)
    else:
        # XLA CPU: the dense masked (B, N) sweep beats the gather-culled
        # path at EVERY mixture size (measured 1.1 s vs 193 s per 32k
        # chunk at N=4096 — the (B, K) candidate gathers are an XLA-CPU
        # compile/runtime pathology). Bound the (B, N) temporaries by
        # shrinking the chunk with N instead — floored to a power of two
        # so the chunk (and with it the _grid_chunks_device /
        # _density_step_dense caches) stays stable while the capacity
        # drifts across 512-buckets over a replay.
        cap_chunk = max(4096, (1 << 29) // max(mix.capacity, 1))
        chunk = min(chunk, 1 << (cap_chunk.bit_length() - 1))
        step_chunk = _density_step_dense(spec, tuple(domain))

    xcs, n = _grid_chunks_device(tuple(domain), (xn, yn, zn), chunk)
    dtj = jnp.asarray(dt, jnp.float32)
    # dispatch ALL chunks asynchronously and keep every result on device:
    # fetching each chunk synchronously serialized the whole sweep on
    # dispatch+transfer round trips (512 chunks at 512^3 — measured ~2.5x
    # the kernel time on the tunneled runtime). The caller fetches the
    # final volume once (for the .vti write).
    outs = [step_chunk(*args, xc, density, dtj) for xc in xcs]
    return jnp.concatenate(outs)[:n].reshape(xn, yn, zn)


@functools.lru_cache(maxsize=None)
def _density_step_dense(spec, domain):
    """Cached jitted semi-Lagrangian chunk step on the dense backend (small
    mixtures / CPU)."""
    from gaussian_fluids_tpu.ops.advect import rk4_advect_pos
    lo = jnp.asarray([domain[0], domain[2], domain[4]], jnp.float32)
    hi = jnp.asarray([domain[1], domain[3], domain[5]], jnp.float32)

    @jax.jit
    def step(params, alive, xc, dens, dtj):
        m = GaussianMixture(params["positions"], params["scalings"],
                            params["rotations"], params["values"], alive)
        bk = rk4_advect_pos(m, spec, xc, -dtj)
        bk = jnp.clip(bk, lo, hi)
        return interp.trilinear_interp(dens, bk, domain)

    return step


@functools.lru_cache(maxsize=None)
def _density_step_pallas(spec, domain, band, sorted_input: bool = False):
    """Cached jitted semi-Lagrangian chunk step — fresh closures re-lower
    per frame, which costs tens of seconds on the tunneled runtime (see
    ops/field.py eval_on_grid note). Queries are sorted once per chunk
    (skipped entirely for ``sorted_input`` — grid-node chunks are x-sorted
    by construction) and the RK4 stages use presorted banded evaluations
    (stage drift is covered by the band margin in _suggest_band)."""
    from gaussian_fluids_tpu.ops import field as field_ops
    lo = jnp.asarray([domain[0], domain[2], domain[4]], jnp.float32)
    hi = jnp.asarray([domain[1], domain[3], domain[5]], jnp.float32)

    @jax.jit
    def step(params, alive, xc, dens, dtj):
        m = GaussianMixture(params["positions"], params["scalings"],
                            params["rotations"], params["values"], alive)
        if sorted_input:
            xs = xc
        else:
            order = jnp.argsort(xc[:, 0])
            inv = jnp.argsort(order)
            xs = xc[order]
        from gaussian_fluids_tpu.ops.advect import rk4_pos_stages
        bk = rk4_pos_stages(
            lambda q: field_ops.value_banded(m, spec, q, band,
                                             presorted=True), xs, -dtj)
        bk = jnp.clip(bk, lo, hi)
        if not sorted_input:
            bk = bk[inv]
        return interp.trilinear_interp(dens, bk, domain)

    return step


@functools.lru_cache(maxsize=None)
def _backtrace_step_pallas(spec, band):
    """Cached jitted RK4 backtrace chunk (banded kernel, sorted once)."""
    from gaussian_fluids_tpu.ops import field as field_ops

    @jax.jit
    def bt(params, alive, xc, dtj):
        m = GaussianMixture(params["positions"], params["scalings"],
                            params["rotations"], params["values"], alive)
        order = jnp.argsort(xc[:, 0])
        inv = jnp.argsort(order)
        xs = xc[order]
        from gaussian_fluids_tpu.ops.advect import rk4_pos_stages
        return rk4_pos_stages(
            lambda q: field_ops.value_banded(m, spec, q, band,
                                             presorted=True), xs, -dtj)[inv]

    return bt


@functools.lru_cache(maxsize=None)
def _backtrace_step_dense(spec):
    """Cached jitted RK4 backtrace chunk (dense backend, small mixtures)."""
    from gaussian_fluids_tpu.ops.advect import rk4_advect_pos

    @jax.jit
    def bt(params, alive, xc, dtj):
        m = GaussianMixture(params["positions"], params["scalings"],
                            params["rotations"], params["values"], alive)
        return rk4_advect_pos(m, spec, xc, -dtj)

    return bt


def advected_density_n(density0, out_dir, spec_domain, dt, n_frames,
                       grid_shape, chunk: int = 262144):
    """Multi-frame re-trace variant (reference 3D/advance_density.py:61-71,
    unused by default): walk grid points back through all n saved velocity
    checkpoints, then sample the INITIAL density once."""
    xn, yn, zn = grid_shape
    pts = grid_points_3d(*spec_domain, xn, yn, zn)
    lo = jnp.asarray([spec_domain[0], spec_domain[2], spec_domain[4]],
                     jnp.float32)
    hi = jnp.asarray([spec_domain[1], spec_domain[3], spec_domain[5]],
                     jnp.float32)
    x = np.asarray(pts)
    use_pallas = jax.default_backend() in ("tpu", "axon")
    for i in range(n_frames - 1, -1, -1):
        mix, spec = checkpoint.load_checkpoint(
            os.path.join(out_dir, f"gaussian_velocity_{i}.pt"))
        mix = mix.x_sorted()   # banded x-window kernel needs x-order
        dtj = jnp.asarray(dt, jnp.float32)
        fchunk = chunk
        if use_pallas:
            band = _suggest_band(mix, spec, dt, chunk=chunk)
            bt_c = _backtrace_step_pallas(spec, band)
            bt = lambda xc: bt_c(mix.params(), mix.alive, xc, dtj)
        else:
            # dense with N-bounded chunk, as in advected_density
            fchunk = min(chunk, max(4096, (1 << 29)
                                    // max(mix.capacity, 1)))
            bt_c = _backtrace_step_dense(spec)
            bt = lambda xc: bt_c(mix.params(), mix.alive, xc, dtj)

        n = x.shape[0]
        pad = (-n) % fchunk
        xp = np.concatenate([x, np.zeros((pad, 3), np.float32)])
        # async dispatch, one fetch (see advected_density)
        outs = [bt(jnp.asarray(xp[s:s + fchunk]))
                for s in range(0, n + pad, fchunk)]
        x = np.asarray(jnp.concatenate(outs))[:n]
    x = np.clip(x, np.asarray(lo), np.asarray(hi))
    sampled = interp.trilinear_interp(density0, jnp.asarray(x), spec_domain)
    return sampled.reshape(xn, yn, zn)


def _write_density_small(host: np.ndarray, origin, spacing, path):
    """Mean-pool the full-resolution density to <= 64 cells per axis and
    save as a compressed .npz (~100s of KB vs 512 MB for the .vti). These
    are the durable evidence for the 512^3 replay: the host running this
    build has been wiped mid-run repeatedly, and the tracked evidence
    snapshots can afford to commit the small volumes but never the full
    ones. Physics analyzers gate on mass / center-of-mass / spread, all
    of which mean-pooling preserves exactly (mass) or to pooled-cell
    resolution (moments)."""
    factors = [-(-s // 64) for s in host.shape]  # ceil: <= 64 cells/axis
    # mass preservation requires each axis divisible by its pool factor;
    # trimming the remainder would silently lose edge mass, so fail loudly
    # on any future non-divisible resolution instead (current shapes —
    # 512^3 production, 48^3 tests — are exactly divisible).
    for s, f in zip(host.shape, factors):
        if s % f:
            raise ValueError(
                f"density shape {host.shape} not divisible by pooling "
                f"factors {factors}; mean-pooling would drop edge planes")
    v = host.reshape(
        host.shape[0] // factors[0], factors[0],
        host.shape[1] // factors[1], factors[1],
        host.shape[2] // factors[2], factors[2]).mean(axis=(1, 3, 5))
    np.savez_compressed(
        path, density=v.astype(np.float16),
        origin=np.asarray(origin, np.float64),
        spacing=np.asarray(
            [sp * f for sp, f in zip(spacing, factors)], np.float64),
        full_shape=np.asarray(host.shape, np.int64))


class _AsyncVtiWriter:
    """Single-slot pipelined .vti writer: fetch-to-host + file write run on
    a background thread so they overlap the NEXT density's on-device chunk
    dispatch. At 512^3 the host transfer of the 512 MB volume over the
    tunneled runtime plus the write dominate the frame time (BASELINE.md);
    overlapping them with compute hides most of that tail. Single-slot so
    at most one extra host volume is alive at a time."""

    def __init__(self):
        import threading
        self._threading = threading
        self._pending = None
        self._error = None

    def submit(self, dev_array, origin, spacing, path, small_path=None):
        self.drain()

        def work():
            try:
                host = np.asarray(dev_array)
                vti.write_vti_array(host, origin, spacing, path)
                if small_path is not None:
                    _write_density_small(host, origin, spacing, small_path)
            except BaseException as e:  # re-raised on the caller's thread
                self._error = e

        self._pending = self._threading.Thread(target=work)
        self._pending.start()

    def drain(self):
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._error is not None:
            e, self._error = self._error, None
            raise e


def advance_density(init_cond: str, out_dir: str, dt: float,
                    res_multiplier: int = 4, grid_res=None,
                    verbose: int = 1, mesh_shape: Optional[tuple] = None,
                    start_frame: int = 0):
    """Replay loop: seed ring densities, then per saved frame advect and
    write .vti volumes (reference 3D/advance_density.py:87-120). The
    reference hard-codes ring_collide's two rings (:95-96); here every
    scene Ring seeds one density (ring1 -> a, ring2 -> b, ...), so all
    ring scenes replay — identical output for ring_collide. The default
    grid is visualize_res * 4 = 512^3 (reference 3D/advance_density.py:3-7);
    ``grid_res`` overrides it for smoke tests. ``mesh_shape`` shards each
    semi-Lagrangian step over a (batch, gauss) device mesh
    (parallel/density.py).

    ``start_frame`` resumes an interrupted replay from its own
    ``density_{tag}_{start_frame}.vti`` outputs instead of re-advecting
    from the seeds (the density state is sequential, so restarting from
    frame 0 repeats hours of 512^3 sweeps). New scope over the reference,
    which always replays from the seeds (3D/advance_density.py:98-107)."""
    from gaussian_fluids_tpu.scenes.fields3d import Ring
    mesh = None
    if mesh_shape is not None:
        from gaussian_fluids_tpu.parallel import mesh_from_shape
        mesh = mesh_from_shape(mesh_shape)
    scene = get_scene_3d(init_cond)
    domain = scene.domain
    xn, yn, zn = grid_res or tuple(r * res_multiplier
                                   for r in scene.visualize_res)
    rings = [scene.info[k] for k in sorted(scene.info)
             if isinstance(scene.info[k], Ring)]
    if not rings:
        raise NotImplementedError(
            f"scene '{init_cond}' defines no rings to seed densities from")
    tags = [chr(ord("a") + i) for i in range(len(rings))]
    spacing = tuple((domain[2 * i + 1] - domain[2 * i]) / s
                    for i, s in enumerate((xn, yn, zn)))
    origin = (domain[0], domain[2], domain[4])
    writer = _AsyncVtiWriter()
    if start_frame > 0:
        from gaussian_fluids_tpu.io import vti
        frame = start_frame
        dens = [jnp.asarray(vti.read_vti_array(os.path.join(
            out_dir, f"density_{tag}_{frame}.vti"))) for tag in tags]
    else:
        frame = 0
        dens = [interp.seed_ring_density((xn, yn, zn), domain, r.center,
                                         r.normal, r.radius, r.thickness)
                for r in rings]
        for tag, d in zip(tags, dens):
            writer.submit(
                d, origin, spacing,
                os.path.join(out_dir, f"density_{tag}_{frame}.vti"),
                os.path.join(out_dir, f"density_small_{tag}_{frame}.npz"))
    while True:
        path = os.path.join(out_dir, f"gaussian_velocity_{frame}.pt")
        if not os.path.exists(path):
            break
        mix, spec = checkpoint.load_checkpoint(path)
        mix = mix.x_sorted()   # banded x-window kernel needs x-order
        frame += 1
        for i, tag in enumerate(tags):
            if mesh is None:
                dens[i] = advected_density(dens[i], mix, spec, domain, dt,
                                           (xn, yn, zn))
            else:
                from gaussian_fluids_tpu.parallel.density import \
                    advected_density_sharded
                dens[i] = advected_density_sharded(
                    dens[i], mix, spec, domain, dt, (xn, yn, zn), mesh)
            writer.submit(
                dens[i], origin, spacing,
                os.path.join(out_dir, f"density_{tag}_{frame}.vti"),
                os.path.join(out_dir,
                             f"density_small_{tag}_{frame}.npz"))
        if verbose:
            print(f"Frame {frame} finished.")
    writer.drain()
