"""Dense-vs-Pallas crossover for the 2D projection epoch: one process,
backend baked per-runner at trace time via GF_FIELD_BACKEND, interleaved
timing. Locates the right _PALLAS_MIN_BN dispatch threshold."""
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

B = 512
scene = get_scene_2d("leapfrog")
sf = scene.scaling_factor
bs2 = scene.boundary_sampler_2
adv = jnp.asarray(scene.advance_domain, jnp.float32)
lo = jnp.stack([adv[0], adv[2]]) * sf
hi = jnp.stack([adv[1], adv[3]]) * sf
dt = jnp.asarray(0.025, jnp.float32)


def build(n_side, backend, do_sort):
    os.environ["GF_FIELD_BACKEND"] = backend
    xs = np.linspace(-5 * sf, 5 * sf, n_side, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    spec = FieldSpec.create((-5 * sf, -5 * sf), (5 * sf, 5 * sf),
                            pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)
    rng = np.random.RandomState(0)
    p = mix.params()
    p["values"] = jnp.asarray(
        0.1 * rng.randn(*p["values"].shape).astype(np.float32))
    mix = mix.with_params(p)

    def epoch(carry, key):
        params, opt_state, alive = carry
        kd, kb2 = jax.random.split(key)
        data = jax.random.uniform(kd, (B, 2), jnp.float32) * (hi - lo) + lo
        if do_sort:
            data = data[jnp.argsort(data[:, 0])]
        old_mix = GaussianMixture(params["positions"], params["scalings"],
                                  params["rotations"], params["values"],
                                  alive)
        ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
            old_mix, spec, data, dt, lo, hi, presorted=True))
        h1 = lambda val, jac: losses.vorticity_loss_2d(jac, ref_vor)
        h2 = lambda val, jac: losses.divergence_loss(jac)
        (l1, l2), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, h1, h2)
        g_data = losses.pcgrad_combine(g_vor, g_div)

        def rest(pp):
            m = GaussianMixture(pp["positions"], pp["scalings"],
                                pp["rotations"], pp["values"], alive)
            total = (10.0 * losses.aniso_loss(pp["scalings"], alive)
                     + 10.0 * losses.volume_loss(pp["scalings"], alive))
            bd, bn, bnr = bs2(kb2, B, adv)
            if do_sort:
                o = jnp.argsort(bd[:, 0])
                bd, bn, bnr = bd[o], bn[o], bnr[o]
            return total + losses.boundary_flux_loss(
                field.value(m, spec, bd, presorted=True, need_dx=False),
                bn, bnr)

        g_rest = jax.grad(rest)(params)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        params, opt_state = optim.step(opt_state, params, grads, l1 + l2)
        return (params, opt_state, alive), l1

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, 100)
        return jax.lax.scan(epoch, carry, keys)

    params = mix.params()
    opt_state = optim.init(params, {k: 1e-4 for k in params}, patience=50)
    carry0 = (params, opt_state, mix.alive)
    return run, carry0


key = jax.random.PRNGKey(0)
for n_side in (int(s) for s in
               os.environ.get("GF_XO_SIDES", "24,40,56,71,100").split(",")):
    variants = []
    for backend, do_sort in (("dense", False), ("pallas", False),
                             ("pallas", True)):
        run, carry0 = build(n_side, backend, do_sort)
        c, _ = run(carry0, key)
        hard_sync(c[0]["positions"])
        variants.append((f"{backend}{'+sort' if do_sort else ''}",
                         run, carry0))
    times = {name: [] for name, _, _ in variants}
    for r in range(5):
        for name, run, carry0 in variants:
            c = carry0
            t0 = time.perf_counter()
            c, _ = run(c, key)
            c, _ = run(c, key)
            hard_sync(c[0]["positions"])
            times[name].append((time.perf_counter() - t0) / 200 * 1e6)
    n = n_side * n_side
    msg = f"N={n:6d} (BN={B * n / 1e6:5.1f}M): "
    msg += "  ".join(f"{name} {sorted(ts)[len(ts) // 2]:7.1f}us"
                     for name, ts in times.items())
    print(msg)
