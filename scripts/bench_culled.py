"""Culled (cell-list) vs centered-Pallas value_and_jac at 3D scale, with
per-step grid rebuild and gradients, scan-timed on the real TPU.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_culled.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field, grid as grid_ops
from gaussian_fluids_tpu.utils.profiling import hard_sync

REPS = 30


def make(n_side, d, vdim):
    xs = np.linspace(-5, 5, n_side, dtype=np.float32)
    grids = np.meshgrid(*([xs] * d), indexing="xy")
    pos = np.stack(grids, -1).reshape(-1, d)
    spec = FieldSpec.create((-5,) * d, (5,) * d, pos.shape[0], d=d, vdim=vdim)
    mix = GaussianMixture.create(pos, spec)
    p = mix.params()
    rng = np.random.RandomState(0)
    p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
    return mix.with_params(p), spec


def bench_scan(step, init_carry, xs):
    f = jax.jit(lambda c, xs: jax.lax.scan(step, c, xs)[0])
    c = f(init_carry, xs)
    hard_sync(c)
    t0 = time.perf_counter()
    c = f(init_carry, xs)
    hard_sync(c)
    np.asarray(jax.tree_util.tree_leaves(c)[0])
    return (time.perf_counter() - t0) / xs.shape[0] * 1e3


def run(tag, n_side, d, vdim, B):
    mix, spec = make(n_side, d, vdim)
    params, alive = mix.params(), mix.alive
    cap = grid_ops.suggest_capacity(mix, spec)
    print(f"{tag}: capacity={cap} n_cells={grid_ops.n_cells(spec)}")
    keys = jax.random.split(jax.random.PRNGKey(0), REPS)

    def mk(p):
        return GaussianMixture(p["positions"], p["scalings"],
                               p["rotations"], p["values"], alive)

    def loss_culled(p, key):
        m = mk(p)
        g = grid_ops.build_grid(m, spec, cap)
        x = jax.random.uniform(key, (B, d), jnp.float32, -5.0, 5.0)
        val, jac = grid_ops.value_and_jac_culled(m, spec, x, g)
        return jnp.abs(val).mean() + jnp.abs(jac).mean()

    def loss_pallas(p, key):
        x = jax.random.uniform(key, (B, d), jnp.float32, -5.0, 5.0)
        val, jac = field.value_and_jac_centered(mk(p), spec, x)
        return jnp.abs(val).mean() + jnp.abs(jac).mean()

    for name, loss in [("culled", loss_culled), ("pallas", loss_pallas)]:
        def fwd_step(carry, key):
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
            print(f"  {name:7s} fwd {t_f:8.3f} ms   fwd+bwd {t_g:8.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:7s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    print(jax.devices())
    run("3d N=64000 B=8192", 40, 3, 3, 8192)
    run("karman-ish N=24025 B=512", 155, 2, 2, 512)
    run("leapfrog2d N=5041 B=512", 71, 2, 2, 512)
