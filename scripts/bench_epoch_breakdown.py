"""Component breakdown of the 2D projection epoch at leapfrog scale
(N=5041, B=512) on the live backend — where does the headline epoch go?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops.advect import rk4_advect
from gaussian_fluids_tpu.solver import covector
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE, B = 71, 512
xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
spec = FieldSpec.create((-5, -5), (5, 5), pos.shape[0], d=2, vdim=2)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p)
x = np.sort(rng.uniform(-4.9, 4.9, (B, 2)).astype(np.float32), axis=0)
x = jnp.asarray(x[np.argsort(x[:, 0])])
params, alive = mix.params(), mix.alive


def timeit(label, f, *args):
    g = jax.jit(f)
    out = g(*args)
    hard_sync(out)
    reps = 300
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    hard_sync(out)
    print(f"{label:34s} {(time.perf_counter() - t0) / reps * 1e6:9.1f} us")


lo = jnp.asarray([-5.0, -5.0]); hi = jnp.asarray([5.0, 5.0])
timeit("value_and_jac (1 eval)",
       lambda pp, q: field.value_and_jac(mix.with_params(pp), spec, q,
                                         presorted=True), params, x)
timeit("value only    (1 eval)",
       lambda pp, q: field.value(mix.with_params(pp), spec, q,
                                 presorted=True), params, x)
timeit("covector target (RK4 + jac)",
       lambda pp, q: covector.advected_vorticity_2d(
           mix.with_params(pp), spec, q, 0.025, lo, hi, presorted=True),
       params, x)
timeit("rk4 pos+deform",
       lambda pp, q: rk4_advect(mix.with_params(pp), spec, q, 0.025,
                                with_deformation=True, presorted=True),
       params, x)


def heads_grads(pp, q, rv):
    h1 = lambda val, jac: jnp.abs(jnp.diff(jnp.diagonal(jac, axis1=1, axis2=2), axis=1)).mean()
    h2 = lambda val, jac: (jnp.trace(jac, axis1=-2, axis2=-1) ** 2).mean()
    return field.two_head_grads(pp, alive, spec, q, h1, h2)


rv = jnp.zeros((B,))
timeit("two-head grads (fwd+2bwd)", heads_grads, params, x, rv)

from gaussian_fluids_tpu.solver import optim
opt_state = optim.init(params, {k: 1e-4 for k in params}, patience=50)
grads = jax.tree.map(jnp.zeros_like, params)
timeit("adam step (4 groups)",
       lambda s, pp, g: optim.step(s, pp, g, jnp.ones(())),
       opt_state, params, grads)
timeit("argsort B=512", lambda q: q[jnp.argsort(q[:, 0])], x)
