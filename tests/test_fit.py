"""Initial fitting smoke test on Taylor-Green (the CPU-runnable PR1 config,
SURVEY.md §4/§7 gate 2): fitted value/grad L1 must fall substantially."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.scenes.fields2d import taylor_green_jac_closed
from gaussian_fluids_tpu.solver.fit import fit_velocity_with_gradient


def test_taylor_green_jacfwd_matches_closed_form():
    scene = get_scene_2d("taylor_green")
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 2 * math.pi, (32, 2)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(scene.velocity_jac(x)),
                               np.asarray(taylor_green_jac_closed(x)),
                               rtol=1e-4, atol=1e-5)


def test_taylor_green_divergence_free():
    scene = get_scene_2d("taylor_green")
    x = jnp.asarray(np.random.RandomState(1).uniform(0, 2 * math.pi, (64, 2)),
                    jnp.float32)
    j = scene.velocity_jac(x)
    div = np.asarray(j[:, 0, 0] + j[:, 1, 1])
    np.testing.assert_allclose(div, 0.0, atol=1e-5)


def test_fit_taylor_green_converges():
    scene = get_scene_2d("taylor_green")
    sf = scene.scaling_factor
    x0, x1, y0, y1 = scene.initialize_domain
    lo = (x0 * sf, y0 * sf)
    hi = (x1 * sf, y1 * sf)
    # small config for CPU speed: 12x12 Gaussians instead of 24x24
    nx = ny = 12
    xs = np.linspace(lo[0], hi[0], nx)
    ys = np.linspace(lo[1], hi[1], ny)
    pos = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    spec = FieldSpec.create(lo, hi, pos.shape[0], d=2, vdim=2)
    mix = GaussianMixture.create(pos, spec)

    key = jax.random.PRNGKey(42)
    # initial loss for comparison
    xq = jax.random.uniform(key, (256, 2)) * (jnp.asarray(hi) -
                                              jnp.asarray(lo)) + jnp.asarray(lo)
    ref_v = scene.target_velocity(xq)
    v0, _ = field.value_and_jac(mix, spec, xq)
    loss0 = float(jnp.abs(v0 - ref_v).mean())

    fitted = fit_velocity_with_gradient(
        mix, spec, scene.target_velocity, scene.target_velocity_jac,
        lo, hi,
        lrs={"positions": 1.6e-3, "scalings": 5e-2, "rotations": 5e-2,
             "values": 5e-3},
        batch_size=256, max_epoch=400, key=key, verbose=0)

    v1, j1 = field.value_and_jac(fitted, spec, xq)
    loss1 = float(jnp.abs(v1 - ref_v).mean())
    assert loss1 < loss0 * 0.25, (loss0, loss1)
    # divergence should be small-ish after fitting a div-free field
    div = jnp.abs(j1[:, 0, 0] + j1[:, 1, 1]).mean()
    assert float(div) < 1.0
