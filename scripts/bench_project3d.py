"""Time the full 3D projection epoch (ring_collide scale: N=64000, B=8192)
with the dense vs Pallas field backend on the real TPU.

Usage: GF_FIELD_BACKEND=dense|auto python scripts/bench_project3d.py [n_side]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import ProjectWeights, _runner_3d
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 40
BATCH = 8192

xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * 3, (5,) * 3, pos.shape[0], d=3, vdim=3)
mix = GaussianMixture.create(pos, spec)
p = mix.params()
rng = np.random.RandomState(0)
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()

run_chunk = _runner_3d(spec, "ring_collide", ProjectWeights(delta_pos=0.0),
                          float(__import__("os").environ.get("GF_BL", "10.0")), BATCH, (-5.0,) * 3, (5.0,) * 3, None)[0]
params = mix.params()
opt_state = optim.init(params, {k: 3e-4 for k in params}, patience=50)
carry = (params, opt_state, mix.alive, mix.params(), mix.alive,
         jnp.asarray(0.02, jnp.float32))
key = jax.random.PRNGKey(0)

EP = 100
carry, _ = run_chunk(carry, key, EP)   # compile + warm (same static n!)
hard_sync(carry[0]["positions"])
t0 = time.perf_counter()
carry, _ = run_chunk(carry, key, EP)
hard_sync(carry[0]["positions"])
np.asarray(carry[0]["positions"][0])
dt = time.perf_counter() - t0
print(f"backend={os.environ.get('GF_FIELD_BACKEND', 'auto')} N={pos.shape[0]}"
      f" B={BATCH}: {dt / EP * 1e3:.2f} ms/epoch ({EP / dt:.1f} epochs/s)")
