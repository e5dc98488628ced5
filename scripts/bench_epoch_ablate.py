"""Ablation of the 2D projection epoch (leapfrog scale) inside lax.scan:
times per-epoch cost with components knocked out, to locate the budget."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver import covector, losses, optim
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE, B = 71, 512
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
bs1, bs2 = scene.boundary_sampler_1, scene.boundary_sampler_2
adv = jnp.asarray(scene.advance_domain, jnp.float32)
lo = jnp.stack([adv[0], adv[2]]) * sf
hi = jnp.stack([adv[1], adv[3]]) * sf
dt = jnp.asarray(0.025, jnp.float32)


def make_runner(do_sort=True, do_cov=True, do_heads=True, do_rest=True,
                do_bnd=True, do_adam=True):
    def epoch(carry, key):
        params, opt_state, alive = carry
        kd, kb1, kb2 = jax.random.split(key, 3)
        data = jax.random.uniform(kd, (B, 2), jnp.float32) * (hi - lo) + lo
        if do_sort:
            data = data[jnp.argsort(data[:, 0])]
        old_mix = GaussianMixture(params["positions"], params["scalings"],
                                  params["rotations"], params["values"],
                                  alive)
        if do_cov:
            ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
                old_mix, spec, data, dt, lo, hi, presorted=True))
        else:
            ref_vor = jnp.zeros((B,))

        if do_heads:
            h1 = lambda val, jac: losses.vorticity_loss_2d(jac, ref_vor)
            h2 = lambda val, jac: losses.divergence_loss(jac)
            (l1, l2), (g_vor, g_div) = field.two_head_grads(
                params, alive, spec, data, h1, h2)
            g_data = losses.pcgrad_combine(g_vor, g_div)
        else:
            l1 = l2 = ref_vor.sum() * 0.0
            g_data = jax.tree.map(jnp.zeros_like, params)

        def rest(pp):
            m = GaussianMixture(pp["positions"], pp["scalings"],
                                pp["rotations"], pp["values"], alive)
            total = jnp.zeros(())
            if do_rest:
                total = (10.0 * losses.aniso_loss(pp["scalings"], alive)
                         + 10.0 * losses.volume_loss(pp["scalings"], alive))
            if do_bnd and bs2 is not None:
                bd, bn, bnr = bs2(kb2, B, adv)
                o = jnp.argsort(bd[:, 0])
                total = total + losses.boundary_flux_loss(
                    field.value(m, spec, bd[o], presorted=True,
                                need_dx=False), bn[o], bnr[o])
            return total

        g_rest = jax.grad(rest)(params)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        if do_adam:
            params, opt_state = optim.step(opt_state, params, grads,
                                           l1 + l2)
        else:
            params = {k: params[k] + 0.0 * grads[k] for k in params}
        return (params, opt_state, alive), l1

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, 100)
        return jax.lax.scan(epoch, carry, keys)

    return run


params = mix.params()
opt_state = optim.init(params, {k: 1e-4 for k in params}, patience=50)
key = jax.random.PRNGKey(0)

variants = [
    ("full", {}),
    ("no covector", {"do_cov": False}),
    ("no heads", {"do_heads": False}),
    ("no boundary", {"do_bnd": False}),
    ("no adam", {"do_adam": False}),
    ("no sort", {"do_sort": False}),
    ("no regs", {"do_rest": False}),
    ("heads+adam only", {"do_cov": False, "do_bnd": False, "do_rest": False,
                         "do_sort": False}),
]
for label, kw in variants:
    run = make_runner(**kw)
    carry = (params, opt_state, mix.alive)
    carry, _ = run(carry, key)
    hard_sync(carry[0]["positions"])
    t0 = time.perf_counter()
    carry, _ = run(carry, key)
    hard_sync(carry[0]["positions"])
    dtv = (time.perf_counter() - t0) / 100 * 1e6
    print(f"{label:22s} {dtv:8.1f} us/epoch")
