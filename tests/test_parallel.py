"""Multi-device sharding on the 8-way virtual CPU mesh: the sharded train
step must run and match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.parallel import sharding
from gaussian_fluids_tpu.solver import optim


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    sharding.dryrun(8)


def test_sharded_step_matches_single_device():
    n, b = 96, 32
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    rng = np.random.RandomState(1)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, 2)), spec, pad=False)
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          jnp.asarray(rng.randn(n, 2), jnp.float32),
                          mix.alive)
    x = jnp.asarray(rng.uniform(-4, 4, (b, 2)), jnp.float32)
    ref_val = jnp.asarray(rng.randn(b, 2), jnp.float32)
    ref_jac = jnp.asarray(rng.randn(b, 2, 2), jnp.float32)

    def run(mesh_devices):
        mesh = sharding.make_mesh(*mesh_devices)
        step, place, data_shard = sharding.make_sharded_train_step(spec, mesh)
        params = mix.params()
        opt = optim.init(params, {k: 1e-3 for k in params})
        params, opt, alive = place(params, opt, mix.alive)
        xp = jax.device_put(x, data_shard)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rv = jax.device_put(ref_val, data_shard)
        rj = jax.device_put(ref_jac,
                            NamedSharding(mesh, P("batch", None, None)))
        p2, _, total = step(params, opt, alive, xp, rv, rj)
        return jax.device_get(p2["positions"]), float(total)

    p1, t1 = run((1, 1))
    p8, t8 = run((4, 2))
    assert abs(t1 - t8) < 1e-5 * max(1.0, abs(t1))
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)


def test_shardmap_step_matches_single_device(monkeypatch):
    """The shard_map (Pallas-compatible) step must reproduce the
    jit-with-shardings step, including when the field eval is forced
    through the Pallas kernels (interpret mode on CPU)."""
    n, b = 128, 32
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    rng = np.random.RandomState(3)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, 2)), spec, pad=False)
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          jnp.asarray(rng.randn(n, 2), jnp.float32),
                          mix.alive)
    x = jnp.asarray(rng.uniform(-4, 4, (b, 2)), jnp.float32)
    ref_val = jnp.asarray(rng.randn(b, 2), jnp.float32)
    ref_jac = jnp.asarray(rng.randn(b, 2, 2), jnp.float32)

    def run(maker, mesh_devices, backend):
        monkeypatch.setenv("GF_FIELD_BACKEND", backend)
        mesh = sharding.make_mesh(*mesh_devices)
        step, place, data_shard = maker(spec, mesh)
        params = mix.params()
        opt = optim.init(params, {k: 1e-3 for k in params})
        params, opt, alive = place(params, opt, mix.alive)
        xp = jax.device_put(x, data_shard)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rv = jax.device_put(ref_val, data_shard)
        rj = jax.device_put(ref_jac,
                            NamedSharding(mesh, P("batch", None, None)))
        p2, _, total = step(params, opt, alive, xp, rv, rj)
        return jax.device_get(p2["positions"]), float(total)

    p1, t1 = run(sharding.make_sharded_train_step, (1, 1), "dense")
    p8, t8 = run(sharding.make_sharded_train_step_shardmap, (4, 2), "dense")
    assert abs(t1 - t8) < 1e-4 * max(1.0, abs(t1))
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)

    # pallas kernels per-shard under shard_map (interpret mode on CPU)
    pp, tp = run(sharding.make_sharded_train_step_shardmap, (4, 2),
                 "pallas")
    assert abs(t1 - tp) < 5e-4 * max(1.0, abs(t1))
    np.testing.assert_allclose(p1, pp, rtol=1e-3, atol=1e-5)
