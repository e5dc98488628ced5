"""Tile sweep for the dual-cotangent dn backward at the 2D headline shape
(N=5041->5120, B=512): the kernel is ~28% of the device epoch; find the
best (tb, tn)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops.pallas import gsr_centered as gc
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE, B, D = 71, 512, 2
xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
spec = FieldSpec.create((-5,) * D, (5,) * D, pos.shape[0], d=D, vdim=D)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p)

x = rng.uniform(-5, 5, (B, D)).astype(np.float32)
x = jnp.asarray(x[np.argsort(x[:, 0])])
clamp = float(spec.clamp_threshold)
cols = (1 + D) * spec.vdim

variants = []
for tb, tn, uv in ((256, 512, True), (256, 512, False), (512, 512, False),
                   (256, 1024, False), (512, 1024, False),
                   (128, 512, False), (512, 2560, False),
                   (256, 2560, False)):
    x_p, b, inv, mu_p, pp_p, v_p, tmask = field._centered_prep(
        mix, spec, x, tb, tn, presorted=True)
    muT, ppT = mu_p.T, pp_p.T
    d1 = jnp.asarray(rng.randn(x_p.shape[0], cols).astype(np.float32))
    d2 = jnp.asarray(rng.randn(x_p.shape[0], cols).astype(np.float32))
    if not uv:
        d1 = d1.at[:, :spec.vdim].set(0.0)
        d2 = d2.at[:, :spec.vdim].set(0.0)

    def mk(tb=tb, tn=tn, uv=uv, tmask=tmask, x_p=x_p, muT=muT, ppT=ppT,
           v_p=v_p):
        @jax.jit
        def f(d1, d2):
            return gc.fused_gsr_centered_bwd2(tmask, x_p, muT, ppT, v_p,
                                              d1, d2, D, spec.vdim, clamp,
                                              tb, tn, use_val=uv)
        return f

    try:
        f = mk()
        r = f(d1, d2)
        hard_sync(r[0][0])
        variants.append((f"tb={tb:4d} tn={tn:4d} val={int(uv)}", f, d1, d2))
    except Exception as e:
        print(f"tb={tb} tn={tn}: FAIL {type(e).__name__}")

times = {name: [] for name, *_ in variants}
for r in range(6):
    for name, f, d1, d2 in variants:
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(d1, d2)
        hard_sync(out[0][0])
        times[name].append((time.perf_counter() - t0) / 50 * 1e6)
for name, *_ in variants:
    ts = sorted(times[name])
    print(name, "med", round(ts[len(ts) // 2], 1), "us",
          ["%.0f" % t for t in ts])
