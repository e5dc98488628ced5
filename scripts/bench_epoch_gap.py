"""Bisect the gap between the stripped leapfrog-2D epoch (~800us, Pallas)
and the production _runner_2d epoch (~965us): add the runner's extras one
at a time to the stripped replica. Interleaved in-process timing."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver import covector, losses, optim
from gaussian_fluids_tpu.solver.project import ProjectWeights
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
p0 = mix.params()
p0["values"] = jnp.asarray(
    0.1 * rng.randn(*p0["values"].shape).astype(np.float32))
mix = mix.with_params(p0)
bs2 = scene.boundary_sampler_2
adv_c = jnp.asarray(scene.advance_domain, jnp.float32)
dt_c = jnp.asarray(0.025, jnp.float32)
w = ProjectWeights()


def make(dyn_adv, old_sep, extras):
    """dyn_adv: adv/dt through the carry (runner) vs closed-over consts.
    old_sep: separate constant old_params in carry vs aliasing params.
    extras: delta_pos reg + bc stacking output (runner bookkeeping)."""
    def epoch(carry, key):
        if dyn_adv:
            params, opt_state, alive, pos_org, oldp, old_alive, adv, dt = \
                carry
        else:
            params, opt_state, alive, pos_org, oldp, old_alive = carry
            adv, dt = adv_c, dt_c
        lo = jnp.stack([adv[0], adv[2]]) * sf
        hi = jnp.stack([adv[1], adv[3]]) * sf
        kd, kb1, kb2 = jax.random.split(key, 3)
        data = jax.random.uniform(kd, (B, 2), jnp.float32) * (hi - lo) + lo
        data = data[jnp.argsort(data[:, 0])]
        om = GaussianMixture(oldp["positions"], oldp["scalings"],
                             oldp["rotations"], oldp["values"], old_alive)
        ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
            om, spec, data, dt, lo, hi, presorted=True))
        h1 = lambda val, jac: w.vor * losses.vorticity_loss_2d(jac, ref_vor)
        h2 = lambda val, jac: w.div * losses.divergence_loss(jac)
        (l1, l2), (g_vor, g_div) = field.two_head_grads(
            params, alive, spec, data, h1, h2)
        g_data = losses.pcgrad_combine(g_vor, g_div)

        def rest(pp):
            m = GaussianMixture(pp["positions"], pp["scalings"],
                                pp["rotations"], pp["values"], alive)
            total = (w.aniso * losses.aniso_loss(pp["scalings"], alive)
                     + w.vol * losses.volume_loss(pp["scalings"], alive))
            if extras:
                total = total + w.delta_pos * losses.delta_pos_loss(
                    pp["positions"], pos_org, alive)
            bc = jnp.zeros(())
            bd, bn, bnr = bs2(kb2, B, adv)
            o = jnp.argsort(bd[:, 0])
            bd, bn, bnr = bd[o], bn[o], bnr[o]
            c2 = losses.boundary_flux_loss(
                field.value(m, spec, bd, presorted=True, need_dx=False),
                bn, bnr)
            total = total + 1.0 * c2
            bc = bc + c2
            return total, bc

        (l_rest, bc), g_rest = jax.value_and_grad(rest, has_aux=True)(
            params)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        params, opt_state = optim.step(opt_state, params, grads,
                                       l1 + l2 + l_rest)
        if dyn_adv:
            carry = (params, opt_state, alive, pos_org, oldp, old_alive,
                     adv, dt)
        else:
            carry = (params, opt_state, alive, pos_org, oldp, old_alive)
        ys = jnp.stack([l1, l2, bc]) if extras else l1
        return carry, ys

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, 100)
        return jax.lax.scan(epoch, carry, keys)

    params = dict(p0)
    opt_state = optim.init(params, {k: 1e-4 for k in params}, patience=50)
    oldp = dict(p0) if old_sep else params
    carry = [params, opt_state, mix.alive,
             jax.lax.stop_gradient(mix.positions), oldp, mix.alive]
    if dyn_adv:
        carry += [adv_c, dt_c]
    return run, tuple(carry)


key = jax.random.PRNGKey(0)
variants = [
    ("base (replica)     ", make(False, False, False)),
    ("+dyn adv/dt        ", make(True, False, False)),
    ("+old_sep           ", make(False, True, False)),
    ("+extras            ", make(False, False, True)),
    ("runner-equiv (all) ", make(True, True, True)),
]
for name, (run, carry0) in variants:
    c, _ = run(carry0, key)
    hard_sync(c[0]["positions"])

times = {name: [] for name, _ in variants}
for r in range(6):
    for name, (run, carry0) in variants:
        c = carry0
        t0 = time.perf_counter()
        c, _ = run(c, key)
        c, _ = run(c, key)
        hard_sync(c[0]["positions"])
        times[name].append((time.perf_counter() - t0) / 200 * 1e6)
for name, _ in variants:
    ts = sorted(times[name])
    print(name, "med", round(ts[len(ts) // 2], 1), "us/epoch",
          ["%.0f" % t for t in ts])
