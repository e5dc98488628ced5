"""A/B the clone's cached-target mode at ring_collide 3D scale
(N=64,000, B=8,192): in-scan re-fit epoch time exact vs cached
(+ the one-time [val, jac] grid precompute at res^3).

Usage: python scripts/bench_clone_target_grid.py [n_side=40] [res=96] [reps=200]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.clone import _clone_runner
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 40
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 96
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 200
B = 8192

xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * 3, (5,) * 3, pos.shape[0], d=3, vdim=3)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(
    0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()
lrs = {"positions": 1e-3, "scalings": 1e-3, "rotations": 1e-3,
       "values": 1e-3}
lo = jnp.asarray(spec.lo, jnp.float32)
hi = jnp.asarray(spec.hi, jnp.float32)
stop = jnp.zeros((mix.capacity,), bool)


def timed_epochs(tg, reps=REPS):
    runner = _clone_runner(spec, B, tg)
    run_chunk = runner[0]
    params = mix.params()
    opt_state = optim.init(params, lrs, patience=50)
    carry = (params, opt_state, mix.alive, stop, mix.params(), mix.alive,
             lo, hi)
    t_pre = 0.0
    if tg is not None:
        tgt = runner[3](mix.params(), mix.alive, lo, hi)
        hard_sync(tgt)
        t0 = time.perf_counter()
        tgt = runner[3](mix.params(), mix.alive, lo, hi)
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
