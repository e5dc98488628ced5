"""Micro-bench: dual-cotangent dn backward vs two single dn backwards.

Usage: python scripts/bench_dual_bwd.py [tb [tn]]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops.pallas import gsr_centered as gc
from gaussian_fluids_tpu.utils.profiling import hard_sync

TB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TN = int(sys.argv[2]) if len(sys.argv) > 2 else 512
N_SIDE, B, D = 40, 8192, 3

xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * D, (5,) * D, pos.shape[0], d=D, vdim=D)
mix = GaussianMixture.create(pos, spec)
p = mix.params()
rng = np.random.RandomState(0)
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()

x = np.sort(rng.uniform(-5, 5, (B, D)).astype(np.float32), axis=0)
x = jnp.asarray(x[np.argsort(x[:, 0])])
x_p, b, inv, mu_p, pp_p, v_p, tmask = field._centered_prep(
    mix, spec, x, TB, TN, presorted=True)
muT, ppT = mu_p.T, pp_p.T
clamp = float(spec.clamp_threshold)
cols = (1 + D) * spec.vdim
dout1 = jnp.asarray(rng.randn(x_p.shape[0], cols).astype(np.float32))
dout2 = jnp.asarray(rng.randn(x_p.shape[0], cols).astype(np.float32))


@jax.jit
def two_single(dout1, dout2):
    r1 = gc._bwd(tmask, x_p, muT, ppT, v_p, dout1, D, spec.vdim, clamp,
                 TB, TN, D, need_dx=False)
    r2 = gc._bwd(tmask, x_p, muT, ppT, v_p, dout2, D, spec.vdim, clamp,
                 TB, TN, D, need_dx=False)
    return r1[1:], r2[1:]


@jax.jit
def dual(dout1, dout2):
    return gc.fused_gsr_centered_bwd2(tmask, x_p, muT, ppT, v_p, dout1,
                                      dout2, D, spec.vdim, clamp, TB, TN)


def timeit(f, label):
    out = f(dout1, dout2)
    hard_sync(out)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(dout1, dout2)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"tb={TB} tn={TN} {label}: {dt:.3f} ms")
    return out


a = timeit(two_single, "two-single")
b_ = timeit(dual, "dual      ")
for i in range(3):
    np.testing.assert_allclose(np.asarray(b_[0][i]), np.asarray(a[0][i]),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_[1][i]), np.asarray(a[1][i]),
                               rtol=2e-3, atol=1e-4)
print("grads match")
