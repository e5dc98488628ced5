import os, time
import jax, jax.numpy as jnp, numpy as np
from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import ProjectWeights, _runner_2d
from gaussian_fluids_tpu.utils.profiling import hard_sync

scene = get_scene_2d("karman")
sf = scene.scaling_factor
dom = scene.advance_domain
xs = np.linspace(dom[0]*sf, dom[1]*sf, 200, dtype=np.float32)
ys = np.linspace(dom[2]*sf, dom[3]*sf, 120, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
spec = FieldSpec.create((dom[0]*sf, dom[2]*sf), (dom[1]*sf, dom[3]*sf), pos.shape[0], d=2, vdim=2)
rng = np.random.RandomState(0)
mix = GaussianMixture.create(pos, spec)
p = mix.params(); p["values"] = jnp.asarray(0.1*rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()

backend = os.environ.get("GF_FIELD_BACKEND", "auto")
run_chunk = _runner_2d(spec, "karman", ProjectWeights(), 1.0, 512,
                       None)[0]
params = mix.params()
ostate = optim.init(params, {k: 1e-4 for k in params}, patience=50)
adv = jnp.asarray(scene.advance_domain, jnp.float32)
carry = (params, ostate, mix.alive, jax.lax.stop_gradient(mix.positions),
         mix.params(), mix.alive, adv, jnp.asarray(0.05, jnp.float32))
key = jax.random.PRNGKey(0)
carry, _ = run_chunk(carry, key, 50)
hard_sync(carry[0]["positions"])
t0 = time.perf_counter()
carry, _ = run_chunk(carry, key, 200)
hard_sync(carry[0]["positions"]); np.asarray(carry[0]["positions"][0])
dt = time.perf_counter()-t0
print(f"karman2d epoch backend={backend}: {dt/200*1e3:.2f} ms/epoch", flush=True)
