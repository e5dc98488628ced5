"""In-scan ablation of the 3D projection epoch (ring_collide scale:
N=64000, B=8192): times the epoch with components knocked out to locate
the budget. Components: covector target (RK4 + deformation = 5 val+jac
evals of the old field), dual two-head fwd+bwd, boundary eval + VJP,
regularizers + PCGrad + Adam.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.scenes import get_scene_3d
from gaussian_fluids_tpu.solver import covector, losses, optim
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 40
B = 8192
xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * 3, (5,) * 3, pos.shape[0], d=3, vdim=3)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()
bs = get_scene_3d("ring_collide").boundary_sampler
lo = jnp.asarray([-5.0] * 3)
hi = jnp.asarray([5.0] * 3)
dt = jnp.asarray(0.02, jnp.float32)
w = {"vor": 1.0, "div": 1.0, "hel": 1.0, "aniso": 10.0, "vol": 10.0}


def make_runner(do_cov=True, do_heads=True, do_bnd=True, do_adam=True):
    def epoch(carry, key):
        params, opt_state, alive = carry
        kd, kb = jax.random.split(key)
        data = jax.random.uniform(kd, (B, 3), jnp.float32) * (hi - lo) + lo
        data = data[jnp.argsort(data[:, 0])]
        old_mix = GaussianMixture(params["positions"], params["scalings"],
                                  params["rotations"], params["values"],
                                  alive)
        if do_cov:
            ref_vor, ref_hel = covector.advected_vorticity_3d(
                old_mix, spec, data, dt, presorted=True)
            ref_vor = jax.lax.stop_gradient(ref_vor)
            ref_hel = jax.lax.stop_gradient(ref_hel)
        else:
            ref_vor = jnp.zeros((B, 3))
            ref_hel = jnp.zeros((B,))

        if do_heads:
            def head_vorhel(val, jac):
                return (w["vor"] * losses.vorticity_loss_3d(jac, ref_vor)
                        + w["hel"] * losses.helicity_loss(val, jac, ref_hel))

            def head_div(val, jac):
                return w["div"] * losses.divergence_loss(jac)

            (l_vorhel, l_div), (g_vor, g_div) = field.two_head_grads(
                params, alive, spec, data, head_vorhel, head_div)
            g_data = losses.pcgrad_combine(g_vor, g_div)
        else:
            l_vorhel = l_div = ref_vor.sum() * 0.0
            g_data = {k: jnp.zeros_like(v) for k, v in params.items()}

        def rest(pp):
            m = GaussianMixture(pp["positions"], pp["scalings"],
                                pp["rotations"], pp["values"], alive)
            total = (w["aniso"] * losses.aniso_loss(pp["scalings"], alive)
                     + w["vol"] * losses.volume_loss(pp["scalings"], alive))
            if do_bnd:
                bd, bn = bs(kb, B)
                o = jnp.argsort(bd[:, 0])
                bd, bn = bd[o], bn[o]
                c = losses.boundary_freeslip_loss(
                    field.value(m, spec, bd, presorted=True,
                                need_dx=False), bn)
                total = total + 10.0 * c
            return total

        l_rest, g_rest = jax.value_and_grad(rest)(params)
        grads = {k: g_rest[k] + g_data[k] for k in params}
        if do_adam:
            params, opt_state = optim.step(opt_state, params, grads,
                                           l_vorhel + l_div + l_rest)
        else:
            params = {k: v + 0.0 * grads[k] for k, v in params.items()}
        return (params, opt_state, alive), l_div

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, 20)
        return jax.lax.scan(epoch, carry, keys)

    return run


def timeit(label, **kw):
    run = make_runner(**kw)
    params = mix.params()
    opt_state = optim.init(params, {k: 3e-4 for k in params}, patience=50)
    carry = (params, opt_state, mix.alive)
    key = jax.random.PRNGKey(0)
    carry, _ = run(carry, key)
    hard_sync(carry[0]["positions"])
    float(carry[0]["positions"][0, 0])
    t0 = time.perf_counter()
    carry, _ = run(carry, key)
    float(carry[0]["positions"][0, 0])
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{label:28s} {ms:8.2f} ms/epoch")
    return ms


full = timeit("full")
timeit("no covector", do_cov=False)
timeit("no heads", do_heads=False)
timeit("no boundary", do_bnd=False)
timeit("no adam", do_adam=False)
timeit("covector only", do_heads=False, do_bnd=False, do_adam=False)
timeit("heads only", do_cov=False, do_bnd=False, do_adam=False)
