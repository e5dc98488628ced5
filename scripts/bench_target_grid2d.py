"""A/B the cached covector-target mode for the 2D projection at karman
production scale (N=24,000, B=512) and leapfrog scale (N=5,041):
in-scan epoch time exact vs cached (+ the one-time grid precompute).

Usage: python scripts/bench_target_grid2d.py [res=256] [reps=400]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import ProjectWeights, _runner_2d
from gaussian_fluids_tpu.utils.profiling import hard_sync

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
B = 512


def scene_mix(scene):
    sf = scene.scaling_factor
    adv = scene.advance_domain
    lo = np.asarray([adv[0], adv[2]], np.float32) * sf
    hi = np.asarray([adv[1], adv[3]], np.float32) * sf
    nx, ny = scene.particle_count
    xs = np.linspace(lo[0], hi[0], nx, dtype=np.float32)
    ys = np.linspace(lo[1], hi[1], ny, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    spec = FieldSpec.create(tuple(lo), tuple(hi), pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    rng = np.random.RandomState(0)
    p["values"] = jnp.asarray(
        0.1 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p).spatially_sorted(), spec, adv


def timed_epochs(scene_name, tg, reps=REPS):
    scene = get_scene_2d(scene_name)
    mix, spec, adv0 = scene_mix(scene)
    w = ProjectWeights()
    lrs = {k: 1e-4 for k in ("positions", "scalings", "rotations", "values")}
    runner = _runner_2d(spec, scene_name, w, 1.0, B, tg)
    run_chunk = runner[0]
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    adv = jnp.asarray(adv0, jnp.float32)
    dt = jnp.asarray(0.05, jnp.float32)
    carry = (params, opt_state, mix.alive,
             jax.lax.stop_gradient(mix.positions), mix.params(), mix.alive,
             adv, dt)
    t_pre = 0.0
    if tg is not None:
        tgt = runner[3](mix.params(), mix.alive, adv, dt)
        hard_sync(tgt)
        t0 = time.perf_counter()
        tgt = runner[3](mix.params(), mix.alive, adv, dt)
        hard_sync(tgt)
        t_pre = time.perf_counter() - t0
        carry = carry + (tgt,)
    c, aux = run_chunk(carry, jax.random.PRNGKey(0), reps)
    hard_sync(aux)
    t0 = time.perf_counter()
    c, aux = run_chunk(c, jax.random.PRNGKey(1), reps)
    hard_sync(aux)
    per = (time.perf_counter() - t0) / reps
    return per, t_pre


for scene_name in ("karman", "leapfrog"):
    per_exact, _ = timed_epochs(scene_name, None)
    per_cached, t_pre = timed_epochs(scene_name, (RES, RES))
    print(f"{scene_name:>10s}: exact {per_exact * 1e3:7.3f} ms  "
          f"cached {per_cached * 1e3:7.3f} ms  "
          f"(+{t_pre * 1e3:.0f} ms one-time precompute at {RES}^2; "
          f"breakeven {t_pre / max(per_exact - per_cached, 1e-9):.0f} epochs)")
