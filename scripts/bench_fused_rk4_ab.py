"""Interleaved single-process A/B at headline scale: staged covector
(4 value-only RK4 launches + endpoint val+jac) vs the single-launch fused
RK4 kernel (ops/pallas/rk4_fused.py) in the FULL 2D projection epoch.

GF_AB_NSIDE / GF_AB_B override the scale (default leapfrog 71 / 512).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver import covector, losses, optim
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE = int(os.environ.get("GF_AB_NSIDE", "71"))
B = int(os.environ.get("GF_AB_B", "512"))
scene = get_scene_2d("leapfrog")
sf = scene.scaling_factor
xs = np.linspace(-5 * sf, 5 * sf, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
spec = FieldSpec.create((-5 * sf, -5 * sf), (5 * sf, 5 * sf), pos.shape[0],
                        d=2, vdim=2)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p)
bs2 = scene.boundary_sampler_2
adv = jnp.asarray(scene.advance_domain, jnp.float32)
lo = jnp.stack([adv[0], adv[2]]) * sf
hi = jnp.stack([adv[1], adv[3]]) * sf
dt = jnp.asarray(0.025, jnp.float32)


def staged_cov(old_mix, data):
    return covector.advected_vorticity_2d(old_mix, spec, data, dt, lo, hi,
                                          presorted=True)


def fused_cov(old_mix, data):
    bk_x, _, dv = field.rk4_valjac_fused(old_mix, spec, data, -dt)
    vor = losses.curl2d(dv)
    inside = jnp.all((bk_x >= lo) & (bk_x <= hi), axis=-1)
    return jnp.where(inside, vor, 0.0)


def make_runner(cov_fn):
    def epoch(carry, key):
        params, opt_state, alive = carry
        kd, kb2 = jax.random.split(key)
        data = jax.random.uniform(kd, (B, 2), jnp.float32) * (hi - lo) + lo
        data = data[jnp.argsort(data[:, 0])]
        old_mix = GaussianMixture(params["positions"], params["scalings"],
                                  params["rotations"], params["values"],
                                  alive)
        ref_vor = jax.lax.stop_gradient(cov_fn(old_mix, data))

        h1 = lambda val, jac: losses.vorticity_loss_2d(jac, ref_vor)
        h2 = lambda val, jac: losses.divergence_loss(jac)
        (l1, l2), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, h1, h2, heads_use_val=False)
        g_data = losses.pcgrad_combine(g_vor, g_div)

        def rest(pp):
            m = GaussianMixture(pp["positions"], pp["scalings"],
                                pp["rotations"], pp["values"], alive)
            total = (10.0 * losses.aniso_loss(pp["scalings"], alive)
                     + 10.0 * losses.volume_loss(pp["scalings"], alive))
            bd, bn, bnr = bs2(kb2, B, adv)
            o = jnp.argsort(bd[:, 0])
            bd, bn, bnr = bd[o], bn[o], bnr[o]
            total = total + losses.boundary_flux_loss(
                field.value(m, spec, bd, presorted=True,
                            need_dx=False), bn, bnr)
            return total

        g_rest = jax.grad(rest)(params)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        params, opt_state = optim.step(opt_state, params, grads, l1 + l2)
        return (params, opt_state, alive), l1

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, 100)
        return jax.lax.scan(epoch, carry, keys)

    return run


variants = [
    ("staged", make_runner(staged_cov)),
    ("fused ", make_runner(fused_cov)),
]

params = mix.params()
opt_state = optim.init(params, {k: 1e-4 for k in params}, patience=50)
key = jax.random.PRNGKey(0)
carry0 = (params, opt_state, mix.alive)

for name, run in variants:
    c, _ = run(carry0, key)
    hard_sync(c[0]["positions"])

ROUNDS = 7
times = {name: [] for name, _ in variants}
for r in range(ROUNDS):
    for name, run in variants:
        c = carry0
        t0 = time.perf_counter()
        c, _ = run(c, key)
        c, _ = run(c, key)
        hard_sync(c[0]["positions"])
        times[name].append((time.perf_counter() - t0) / 200 * 1e6)

for name, _ in variants:
    ts = sorted(times[name])
    med = ts[len(ts) // 2]
    print(f"N={pos.shape[0]} B={B} {name}  med {med:7.1f} us/epoch   "
          f"all {['%.0f' % t for t in ts]}")
