"""A/B the cached covector-target mode at ring_collide 3D scale
(N=64,000, B=8,192): in-scan epoch time exact vs cached (+ the one-time
grid precompute), and real-projection fidelity (exact-target test metrics
after the same epoch budget, both modes from the same init).

Usage: python scripts/bench_target_grid.py [n_side=40] [res=128] [epochs=600]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import (ProjectWeights, _runner_3d,
                                                project_3d)
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 40
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 128
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 600
B = 8192
DOM = (-5.0, 5.0, -5.0, 5.0, -5.0, 5.0)

xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * 3, (5,) * 3, pos.shape[0], d=3, vdim=3)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(
    0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()
dt = jnp.asarray(0.02, jnp.float32)
w = ProjectWeights(delta_pos=0.0)
lrs = {"positions": 3e-4, "scalings": 1e-5, "rotations": 3e-4,
       "values": 1e-5}


def timed_epochs(tg, reps=200):
    runner = _runner_3d(spec, "ring_collide", w, 10.0, B,
                        (-5.0,) * 3, (5.0,) * 3, tg)
    run_chunk = runner[0]
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    carry = (params, opt_state, mix.alive, mix.params(), mix.alive, dt)
    t_pre = 0.0
    if tg is not None:
        tgt = runner[3](mix.params(), mix.alive, dt)
        hard_sync(tgt)
        t0 = time.perf_counter()
        tgt = runner[3](mix.params(), mix.alive, dt)
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


per_exact, _ = timed_epochs(None)
print(f"exact epoch:  {per_exact * 1e3:8.2f} ms")
per_cached, t_pre = timed_epochs((RES,) * 3)
print(f"cached epoch: {per_cached * 1e3:8.2f} ms  "
      f"(+{t_pre:.2f}s one-time precompute at {RES}^3; "
      f"breakeven {t_pre / max(per_exact - per_cached, 1e-9):.0f} epochs)")

# fidelity: same-init short projection, exact test metrics both ways
xs_t = np.linspace(-4.9, 4.9, 16, dtype=np.float32)
test_x = jnp.asarray(
    np.stack(np.meshgrid(xs_t, xs_t, xs_t, indexing="ij"), -1).reshape(-1, 3))
for label, tgr in (("exact", 0), (f"cached@{RES}", RES)):
    t0 = time.perf_counter()
    project_3d(mix, spec, mix, 0.02, domain=DOM, test_x=test_x,
               key=jax.random.PRNGKey(7), scene_name="ring_collide",
               weights=w, batch_size=B, max_epoch=EPOCHS, check_iter=100,
               verbose=1, target_grid_res=tgr)
    print(f"--- {label}: {EPOCHS} epochs in {time.perf_counter() - t0:.1f}s")
