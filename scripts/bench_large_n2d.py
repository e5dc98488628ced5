"""Epoch cost vs Gaussian count at the Karman large-N regime.

The Karman-2D full-horizon run spent its wall-clock tail at N ~ 64k-114k
(adaptive splitting grows 24,000 -> 113,838 by frame 160, BASELINE.md).
This sweeps the FULL 2D projection epoch (shared forward + dual-head VJP
+ PCGrad + Adam, the bench.py workload at leapfrog scale) over N to show
where the per-epoch cost goes super-linear and how tile occupancy holds
up when the mixture is spread over the Karman strip geometry.

Usage: python scripts/bench_large_n2d.py [n1 n2 ...]   (defaults below)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gaussian_fluids_tpu.utils.profiling import hard_sync  # noqa: E402

NS = [int(v) for v in sys.argv[1:]] or [24000, 49152, 65536, 98304, 131072]
B = 512
EPOCHS = 200


def run(n):
    import jax
    import jax.numpy as jnp
    from gaussian_fluids_tpu import FieldSpec, GaussianMixture
    from gaussian_fluids_tpu.solver import optim
    from gaussian_fluids_tpu.solver.project import ProjectWeights, _runner_2d

    # Karman strip geometry: long thin advance domain (25 x 6 scaled by
    # sf ~ 10/6), Gaussians spread over it like the production run
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("karman")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.initialize_domain) * sf
    rng = np.random.RandomState(0)
    pos = np.stack([rng.uniform(x0, x1, n), rng.uniform(y0, y1, n)],
                   -1).astype(np.float32)
    spec = FieldSpec.create((x0, y0), (x1, y1), n, d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    p["values"] = jnp.asarray(
        0.1 * rng.randn(*p["values"].shape).astype(np.float32))
    mix = mix.with_params(p).spatially_sorted()

    run_chunk = _runner_2d(spec, "karman", ProjectWeights(), 1.0, B, None)[0]
    params = mix.params()
    opt_state = optim.init(
        params, {"positions": 1e-4, "scalings": 1e-4,
                 "rotations": 1e-4, "values": 1e-4}, patience=500)
    adv = jnp.asarray(np.asarray(scene.advance_domain, np.float32))
    carry = (params, opt_state, mix.alive, params["positions"],
             params, mix.alive, adv, jnp.float32(0.05))
    key = jax.random.PRNGKey(0)

    carry2, _ = run_chunk(carry, key, 20)   # compile + warm
    hard_sync(carry2[0]["values"])
    t0 = time.perf_counter()
    carry2, _ = run_chunk(carry, key, EPOCHS)
    hard_sync(carry2[0]["values"])
    dt = (time.perf_counter() - t0) / EPOCHS
    print(f"N={n:7d}  {dt * 1e3:8.3f} ms/epoch  "
          f"{B * n / dt / 1e9:8.2f} Geval/s", flush=True)
    return dt


if __name__ == "__main__":
    print(f"full 2D projection epoch (B={B}), Karman strip geometry")
    prev = None
    for n in NS:
        dt = run(n)
        if prev is not None:
            n0, d0 = prev
            print(f"         scaling vs N={n0}: cost x{dt / d0:.2f} for "
                  f"N x{n / n0:.2f}", flush=True)
        prev = (n, dt)
