"""Micro-benchmark: dense XLA vs centered Pallas value_and_jac (fwd+grad) at
several workload scales. Reps run inside one jitted lax.scan with a carried
data dependency, so the device must execute every iteration (a host-side
timing loop under the tunneled runtime under-measures).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_backends.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.utils.profiling import hard_sync

REPS = 50


def make(n_side, d, vdim, lo, hi):
    xs = np.linspace(lo, hi, n_side, dtype=np.float32)
    grids = np.meshgrid(*([xs] * d), indexing="xy")
    pos = np.stack(grids, -1).reshape(-1, d)
    spec = FieldSpec.create((lo,) * d, (hi,) * d, pos.shape[0], d=d, vdim=vdim)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    rng = np.random.RandomState(0)
    p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def bench_scan(step, init_carry, xs):
    """Time jit(scan(step)) over xs; returns ms per step."""
    f = jax.jit(lambda c, xs: jax.lax.scan(step, c, xs)[0])
    c = f(init_carry, xs)               # compile + warm
    hard_sync(c)
    t0 = time.perf_counter()
    c = f(init_carry, xs)
    hard_sync(c)
    np.asarray(jax.tree_util.tree_leaves(c)[0])   # force host fetch
    return (time.perf_counter() - t0) / xs.shape[0] * 1e3


def run(tag, n_side, d, vdim, B):
    mix, spec = make(n_side, d, vdim, -5.0, 5.0)
    params, alive = mix.params(), mix.alive
    keys = jax.random.split(jax.random.PRNGKey(0), REPS)

    def mk(p, a):
        return GaussianMixture(p["positions"], p["scalings"],
                               p["rotations"], p["values"], a)

    for name, vj in [("dense", field.value_and_jac),
                     ("pallas", field.value_and_jac_centered)]:
        def loss(p, key):
            x = jax.random.uniform(key, (B, d), jnp.float32, -5.0, 5.0)
            val, jac = vj(mk(p, alive), spec, x)
            return jnp.abs(val).mean() + jnp.abs(jac).mean()

        def fwd_step(carry, key):
            # perturb values by carry so reps can't be CSE'd away
            p = dict(params)
            p["values"] = params["values"] + carry
            return loss(p, key), None

        def grad_step(carry, key):
            p = dict(params)
            p["values"] = params["values"] + carry
            g = jax.grad(loss)(p, key)
            return carry + 1e-12 * g["values"], None

        try:
            t_f = bench_scan(fwd_step, jnp.float32(0.0), keys)
            t_g = bench_scan(grad_step, jnp.zeros_like(params["values"]), keys)
            print(f"{tag:28s} {name:7s} fwd {t_f:8.3f} ms   fwd+bwd {t_g:8.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:28s} {name:7s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    print(jax.devices())
    run("leapfrog2d N=5041 B=512", 71, 2, 2, 512)
    run("karman-ish N=24025 B=512", 155, 2, 2, 512)
    run("3d N=21952 B=8192", 28, 3, 3, 8192)
    run("3d N=64000 B=8192", 40, 3, 3, 8192)
