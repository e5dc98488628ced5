"""Multi-device sharding on the 8-way virtual CPU mesh: the sharded train
step must run and match the single-device result."""

import os
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


def test_sharded_projection_epoch_matches_single_device(monkeypatch):
    """The sharded FULL projection epoch (covector target + dual heads +
    PCGrad + boundary + regularizers + Adam) must reproduce the
    single-device epoch math on the same inputs."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver import covector, losses
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    n, b = 128, 32
    dt = jnp.asarray(0.025, jnp.float32)
    w = ProjectWeights()
    rng = np.random.RandomState(5)
    spec = FieldSpec.create(tuple(np.asarray(lo)), tuple(np.asarray(hi)),
                            n, d=2, vdim=2)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(
            r.uniform(np.asarray(lo) * 0.8, np.asarray(hi) * 0.8, (n, 2)),
            spec, pad=False)
        # anisotropic scalings + random rotations: isotropic Gaussians have
        # EXACTLY zero rotation gradients, and Adam normalizes the sharded
        # psum's ~1e-10 roundoff up to visible updates
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(5), rand_mix(6)
    data = jnp.asarray(rng.uniform(np.asarray(lo), np.asarray(hi), (b, 2)),
                       jnp.float32)
    bd, bn, bnr = scene.boundary_sampler_2(jax.random.PRNGKey(2), b, adv)

    # ---- single-device epoch (solver/project.py math, inline) ----
    params = mix.params()
    alive = mix.alive
    pos_org = jax.lax.stop_gradient(mix.positions)
    ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
        old_mix, spec, data, dt, lo, hi))
    h1 = lambda val, jac: w.vor * losses.vorticity_loss_2d(jac, ref_vor)
    h2 = lambda val, jac: w.div * losses.divergence_loss(jac)
    (l_vor, l_div), (g_vor, g_div) = field.two_head_grads(
        params, alive, spec, data, h1, h2, heads_use_val=False)
    g_data = losses.pcgrad_combine(g_vor, g_div)

    def rest(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], alive)
        total = (w.aniso * losses.aniso_loss(p["scalings"], alive)
                 + w.vol * losses.volume_loss(p["scalings"], alive)
                 + w.delta_pos * losses.delta_pos_loss(
                     p["positions"], pos_org, alive))
        c = losses.boundary_flux_loss(
            field.value(m, spec, bd, need_dx=False), bn, bnr)
        return total + 1.0 * c

    l_rest, g_rest = jax.value_and_grad(rest)(params)
    grads = {k: g_rest[k] + g_data[k] for k in params}
    opt = optim.init(params, {k: 1e-4 for k in params}, patience=50)
    p_ref, _ = optim.step(opt, params, grads, l_vor + l_div + l_rest)

    # ---- sharded epoch on the (4, 2) mesh ----
    mesh = sharding.make_mesh(4, 2)
    step, place, data_shard = sharding.make_sharded_project_step_2d(
        spec, mesh, "leapfrog", boundary_lambda=1.0, weights=w)
    opt2 = optim.init(mix.params(), {k: 1e-4 for k in mix.params()},
                      patience=50)
    (sp, sopt, salive, spos_org, sold, sold_alive) = place(
        mix.params(), opt2, mix.alive, pos_org, old_mix.params(),
        old_mix.alive)
    from jax.sharding import NamedSharding, PartitionSpec as P
    put_b = lambda a: jax.device_put(a, data_shard)
    p_out, _, ls = step(sp, sopt, salive, spos_org, sold, sold_alive,
                        adv, dt, put_b(data), put_b(bd), put_b(bn),
                        jax.device_put(bnr, NamedSharding(mesh, P("batch"))))
    np.testing.assert_allclose(float(ls[0]), float(l_vor), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(ls[1]), float(l_div), rtol=1e-5,
                               atol=1e-7)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)


def test_sharded_projection_epoch_3d_matches_single_device(monkeypatch):
    """3D: deformation-gradient covector pullback + helicity head under
    sharding must reproduce the single-device epoch."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.scenes import get_scene_3d
    from gaussian_fluids_tpu.solver import covector, losses
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    n, b = 128, 32
    dt = jnp.asarray(0.02, jnp.float32)
    w = ProjectWeights(delta_pos=0.0)
    spec = FieldSpec.create((-5,) * 3, (5,) * 3, n, d=3, vdim=3)
    bs = get_scene_3d("ring_collide").boundary_sampler

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(r.uniform(-4, 4, (n, 3)), spec,
                                   pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 3), jnp.float32)
        rot = jnp.asarray(r.randn(n, 4) * 0.1
                          + np.array([1.0, 0, 0, 0]), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 3), jnp.float32), m.alive)

    mix, old_mix = rand_mix(8), rand_mix(9)
    rng = np.random.RandomState(4)
    data = jnp.asarray(rng.uniform(-4.5, 4.5, (b, 3)), jnp.float32)
    bd, bn = bs(jax.random.PRNGKey(3), b)

    params, alive = mix.params(), mix.alive
    ref_vor, ref_hel = covector.advected_vorticity_3d(old_mix, spec, data,
                                                      dt)
    ref_vor = jax.lax.stop_gradient(ref_vor)
    ref_hel = jax.lax.stop_gradient(ref_hel)
    h1 = lambda val, jac: (w.vor * losses.vorticity_loss_3d(jac, ref_vor)
                           + w.hel * losses.helicity_loss(val, jac,
                                                          ref_hel))
    h2 = lambda val, jac: w.div * losses.divergence_loss(jac)
    (l_vorhel, l_div), (g_vor, g_div) = field.two_head_grads(
        params, alive, spec, data, h1, h2)
    g_data = losses.pcgrad_combine(g_vor, g_div)

    def rest(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], alive)
        total = (w.aniso * losses.aniso_loss(p["scalings"], alive)
                 + w.vol * losses.volume_loss(p["scalings"], alive)
                 + w.val_reg * losses.value_reg_loss(p["values"], alive))
        c = losses.boundary_freeslip_loss(
            field.value(m, spec, bd, need_dx=False), bn)
        return total + 10.0 * c

    l_rest, g_rest = jax.value_and_grad(rest)(params)
    grads = {k: g_rest[k] + g_data[k] for k in params}
    opt = optim.init(params, {k: 3e-4 for k in params}, patience=50)
    p_ref, _ = optim.step(opt, params, grads, l_vorhel + l_div + l_rest)

    mesh = sharding.make_mesh(4, 2)
    step, place, data_shard = sharding.make_sharded_project_step_3d(
        spec, mesh, boundary_lambda=10.0, weights=w)
    opt2 = optim.init(mix.params(), {k: 3e-4 for k in mix.params()},
                      patience=50)
    sp, sopt, salive, sold, sold_alive = place(
        mix.params(), opt2, mix.alive, old_mix.params(), old_mix.alive)
    put_b = lambda a: jax.device_put(a, data_shard)
    p_out, _, ls = step(sp, sopt, salive, sold, sold_alive, dt,
                        put_b(data), put_b(bd), put_b(bn))
    np.testing.assert_allclose(float(ls[0]), float(l_vorhel), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(ls[1]), float(l_div), rtol=1e-5,
                               atol=1e-7)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)


import pytest


@pytest.mark.parametrize("backend,rtol", [("dense", 2e-4),
                                          ("pallas", 1e-3)])
def test_sharded_projection_epoch_karman(monkeypatch, backend, rtol):
    """Karman exercises BOTH boundary samplers (type-1 Dirichlet cylinder +
    5-edge flux) in the sharded projection epoch; the pallas variant runs
    the kernels per shard (interpret mode on CPU)."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver import covector, losses
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    scene = get_scene_2d("karman")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    n, b = 128, 32
    dt = jnp.asarray(0.05, jnp.float32)
    w = ProjectWeights()
    rng = np.random.RandomState(12)
    spec = FieldSpec.create(tuple(np.asarray(lo)), tuple(np.asarray(hi)),
                            n, d=2, vdim=2)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        span = np.asarray(hi) - np.asarray(lo)
        m = GaussianMixture.create(
            r.uniform(np.asarray(lo) + 0.1 * span,
                      np.asarray(hi) - 0.1 * span, (n, 2)), spec,
            pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(13), rand_mix(14)
    data = jnp.asarray(
        rng.uniform(np.asarray(lo), np.asarray(hi), (b, 2)), jnp.float32)
    bd1, bval1 = scene.boundary_sampler_1(jax.random.PRNGKey(7), b, adv)
    bd, bn, bnr = scene.boundary_sampler_2(jax.random.PRNGKey(8), 8, adv)
    assert bd.shape[0] == 40  # 5-edge sampler: 5n rows

    # ---- single-device reference (dense) ----
    params, alive = mix.params(), mix.alive
    pos_org = jax.lax.stop_gradient(mix.positions)
    ref_vor = jax.lax.stop_gradient(covector.advected_vorticity_2d(
        old_mix, spec, data, dt, lo, hi))
    h1 = lambda val, jac: w.vor * losses.vorticity_loss_2d(jac, ref_vor)
    h2 = lambda val, jac: w.div * losses.divergence_loss(jac)
    (l_vor, l_div), (g_vor, g_div) = field.two_head_grads(
        params, alive, spec, data, h1, h2, heads_use_val=False)
    g_data = losses.pcgrad_combine(g_vor, g_div)

    def rest(p):
        m = GaussianMixture(p["positions"], p["scalings"], p["rotations"],
                            p["values"], alive)
        total = (w.aniso * losses.aniso_loss(p["scalings"], alive)
                 + w.vol * losses.volume_loss(p["scalings"], alive)
                 + w.delta_pos * losses.delta_pos_loss(
                     p["positions"], pos_org, alive))
        c1 = losses.boundary_dirichlet_loss(
            field.value(m, spec, bd1, need_dx=False), bval1)
        c2 = losses.boundary_flux_loss(
            field.value(m, spec, bd, need_dx=False), bn, bnr)
        return total + 1.0 * (c1 + c2)

    l_rest, g_rest = jax.value_and_grad(rest)(params)
    grads = {k: g_rest[k] + g_data[k] for k in params}
    opt = optim.init(params, {k: 1e-4 for k in params}, patience=50)
    p_ref, _ = optim.step(opt, params, grads, l_vor + l_div + l_rest)

    # ---- sharded epoch ----
    monkeypatch.setenv("GF_FIELD_BACKEND", backend)
    mesh = sharding.make_mesh(4, 2)
    step, place, data_shard = sharding.make_sharded_project_step_2d(
        spec, mesh, "karman", boundary_lambda=1.0, weights=w)
    opt2 = optim.init(mix.params(), {k: 1e-4 for k in mix.params()},
                      patience=50)
    sp, sopt, salive, spos_org, sold, sold_alive = place(
        mix.params(), opt2, mix.alive, pos_org, old_mix.params(),
        old_mix.alive)
    put_b = lambda a: jax.device_put(a, data_shard)
    from jax.sharding import NamedSharding, PartitionSpec as P
    p_out, _, ls = step(sp, sopt, salive, spos_org, sold, sold_alive,
                        adv, dt, put_b(data), put_b(bd1), put_b(bval1),
                        put_b(bd), put_b(bn),
                        jax.device_put(bnr, NamedSharding(mesh,
                                                          P("batch"))))
    np.testing.assert_allclose(float(ls[0]), float(l_vor), rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(float(ls[1]), float(l_div), rtol=1e-3,
                               atol=1e-6)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]), rtol=rtol,
                                   atol=1e-5, err_msg=k)


def test_sharded_clone_epoch_matches_single_device(monkeypatch):
    """The sharded clone re-fit epoch (freeze mask + in-step old-field
    targets + clone regularizers + Adam) must reproduce the single-device
    clone epoch math (solver/clone.py loss_fn) on the same inputs."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.solver import losses

    n, b = 128, 32
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    rng = np.random.RandomState(7)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(r.uniform(-4, 4, (n, 2)), spec,
                                   pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(7), rand_mix(8)
    stop = jnp.asarray(rng.rand(n) < 0.5)
    x = jnp.asarray(rng.uniform(-4, 4, (b, 2)), jnp.float32)
    lrs = {"positions": 1e-2, "scalings": 5e-2, "rotations": 5e-2,
           "values": 5e-3}

    # ---- single-device epoch (solver/clone.py loss_fn, inline) ----
    params = mix.params()
    alive = mix.alive
    rv, rj = field.value_and_jac(old_mix, spec, x)
    ref_val = jax.lax.stop_gradient(rv)
    ref_jac = jax.lax.stop_gradient(rj)

    def loss_fn(p):
        frozen = losses.freeze_params(p, stop)
        val, jac = field.value_and_jac(
            GaussianMixture(frozen["positions"], frozen["scalings"],
                            frozen["rotations"], frozen["values"], alive),
            spec, x, need_dx=False)
        l_val = losses.value_loss(val, ref_val)
        l_grad = losses.grad_loss(jac, ref_jac)
        l_aniso = losses.aniso_loss(p["scalings"], alive & ~stop)
        l_vol = losses.volume_loss(p["scalings"], alive, detach_mask=stop)
        total = l_val + l_grad + l_aniso + l_vol
        return total, jnp.stack([l_val, l_grad, l_aniso, l_vol])

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    opt = optim.init(params, lrs, patience=50)
    p_ref, _ = optim.step(opt, params, grads, total)

    # frozen rows must receive exactly zero gradient
    for k in grads:
        g = np.asarray(grads[k])
        frozen_rows = np.asarray(stop)
        # regularizer grads on scalings touch frozen rows only through the
        # detached mean, which is stop-gradient'd too -> still zero
        assert np.all(g[frozen_rows] == 0.0), k

    # ---- sharded epoch on the (4, 2) mesh ----
    mesh = sharding.make_mesh(4, 2)
    step, place, data_shard = sharding.make_sharded_clone_step(spec, mesh)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, sstop, sold, sold_alive = place(
        mix.params(), opt2, mix.alive, stop, old_mix.params(),
        old_mix.alive)
    p_out, _, saux = step(sp, sopt, salive, sstop, sold, sold_alive,
                          jax.device_put(x, data_shard))
    np.testing.assert_allclose(np.asarray(saux), np.asarray(aux),
                               rtol=1e-5, atol=1e-7)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)


def test_sharded_clone_epoch_3d_matches_single_device(monkeypatch):
    """3D (quaternion rotations): the sharded clone epoch must reproduce
    the single-device clone epoch math."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.solver import losses

    n, b = 128, 32
    spec = FieldSpec.create((-5,) * 3, (5,) * 3, n, d=3, vdim=3)
    rng = np.random.RandomState(9)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(r.uniform(-4, 4, (n, 3)), spec,
                                   pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 3), jnp.float32)
        rot = jnp.asarray(r.randn(n, 4) * 0.1
                          + np.array([1.0, 0, 0, 0]), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 3), jnp.float32), m.alive)

    mix, old_mix = rand_mix(9), rand_mix(10)
    stop = jnp.asarray(rng.rand(n) < 0.5)
    x = jnp.asarray(rng.uniform(-4, 4, (b, 3)), jnp.float32)
    lrs = {k: 1e-3 for k in ("positions", "scalings", "rotations",
                             "values")}

    params = mix.params()
    alive = mix.alive
    ref_val, ref_jac = jax.tree.map(
        jax.lax.stop_gradient, field.value_and_jac(old_mix, spec, x))

    def loss_fn(p):
        frozen = losses.freeze_params(p, stop)
        val, jac = field.value_and_jac(
            GaussianMixture(frozen["positions"], frozen["scalings"],
                            frozen["rotations"], frozen["values"], alive),
            spec, x, need_dx=False)
        total = (losses.value_loss(val, ref_val)
                 + losses.grad_loss(jac, ref_jac)
                 + losses.aniso_loss(p["scalings"], alive & ~stop)
                 + losses.volume_loss(p["scalings"], alive,
                                      detach_mask=stop))
        return total

    total, grads = jax.value_and_grad(loss_fn)(params)
    opt = optim.init(params, lrs, patience=50)
    p_ref, _ = optim.step(opt, params, grads, total)

    mesh = sharding.make_mesh(4, 2)
    step, place, data_shard = sharding.make_sharded_clone_step(spec, mesh)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, sstop, sold, sold_alive = place(
        mix.params(), opt2, mix.alive, stop, old_mix.params(),
        old_mix.alive)
    p_out, _, _ = step(sp, sopt, salive, sstop, sold, sold_alive,
                       jax.device_put(x, data_shard))
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]),
                                   np.asarray(p_ref[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)


def test_sharded_chunk_runner_matches_step(monkeypatch):
    """One epoch through the scanned chunk runner (in-graph per-device
    sampling, parallel/driver.py) must equal the one-step shard_map epoch
    fed the identical samples."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    n, b_global = 128, 64
    dt = jnp.asarray(0.025, jnp.float32)
    w = ProjectWeights()
    spec = FieldSpec.create(tuple(np.asarray(lo)), tuple(np.asarray(hi)),
                            n, d=2, vdim=2)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(
            r.uniform(np.asarray(lo) * 0.8, np.asarray(hi) * 0.8, (n, 2)),
            spec, pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(11), rand_mix(12)
    lrs = {k: 1e-4 for k in mix.params()}
    mesh = sharding.make_mesh(4, 2)
    n_batch = 4
    b_local = b_global // n_batch

    # ---- chunk runner, one epoch ----
    run_chunk, place = driver.make_sharded_project_chunk_2d(
        spec, mesh, "leapfrog", 1.0, w, batch_size=b_global)
    opt = optim.init(mix.params(), lrs, patience=50)
    carry = place(mix.params(), opt, mix.alive,
                  jax.lax.stop_gradient(mix.positions), old_mix.params(),
                  old_mix.alive, scene.advance_domain, 0.025)
    key = jax.random.PRNGKey(3)
    carry2, ls = run_chunk(carry, key, 1)
    p_chunk = {k: np.asarray(v) for k, v in carry2[0].items()}

    # ---- reconstruct the per-device samples, feed the one-step epoch ----
    keys = jax.random.split(key, 1)
    datas, bds, bns, bnrs = [], [], [], []
    for i in range(n_batch):
        ki = jax.random.fold_in(keys[0], i)
        kd, kb1, kb2 = jax.random.split(ki, 3)
        datas.append(jax.random.uniform(kd, (b_local, 2), jnp.float32)
                     * (hi - lo) + lo)
        bd, bn, bnr = scene.boundary_sampler_2(kb2, b_local, adv)
        bds.append(bd), bns.append(bn), bnrs.append(bnr)
    data = jnp.concatenate(datas)
    step, splace, data_shard = sharding.make_sharded_project_step_2d(
        spec, mesh, "leapfrog", boundary_lambda=1.0, weights=w)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, spos, sold, sold_alive = splace(
        mix.params(), opt2, mix.alive,
        jax.lax.stop_gradient(mix.positions), old_mix.params(),
        old_mix.alive)
    put_b = lambda a: jax.device_put(a, data_shard)
    p_step, _, ls2 = step(sp, sopt, salive, spos, sold, sold_alive, adv,
                          dt, put_b(data), put_b(jnp.concatenate(bds)),
                          put_b(jnp.concatenate(bns)),
                          jax.device_put(jnp.concatenate(bnrs),
                                         NamedSharding(mesh, P("batch"))))
    np.testing.assert_allclose(np.asarray(ls)[0], np.asarray(ls2),
                               rtol=1e-5, atol=1e-7)
    for k in p_chunk:
        np.testing.assert_allclose(p_chunk[k], np.asarray(p_step[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_project_2d_sharded_runs_and_improves(monkeypatch):
    """The multi-chip projection host loop (parallel/driver.py) runs end
    to end on the virtual mesh and does not diverge: test losses stay
    finite and the divergence residual does not grow."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.project import _runner_2d, \
        ProjectWeights

    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    n = 128
    w = ProjectWeights()
    spec = FieldSpec.create(tuple(np.asarray(lo)), tuple(np.asarray(hi)),
                            n, d=2, vdim=2)
    r = np.random.RandomState(13)
    m = GaussianMixture.create(
        r.uniform(np.asarray(lo) * 0.8, np.asarray(hi) * 0.8, (n, 2)),
        spec, pad=False)
    mix = GaussianMixture(m.positions, m.scalings, m.rotations,
                          jnp.asarray(0.1 * r.randn(n, 2), jnp.float32),
                          m.alive)
    old_mix = mix
    xs = np.linspace(np.asarray(lo)[0], np.asarray(hi)[0], 12)
    ys = np.linspace(np.asarray(lo)[1], np.asarray(hi)[1], 12)
    test_x = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)

    mesh = sharding.make_mesh(4, 2)
    _, test_ref_fn, test_fn, _ = _runner_2d(spec, "leapfrog", w, 1.0, 64,
                                            None)
    dt = jnp.asarray(0.025, jnp.float32)
    tref = test_ref_fn(old_mix.params(), old_mix.alive,
                       jnp.asarray(test_x), adv, dt)
    pos_org = jax.lax.stop_gradient(mix.positions)
    tk = jax.random.PRNGKey(99)
    lv0, ld0 = jax.device_get(test_fn(
        mix.params(), mix.alive, pos_org, adv, jnp.asarray(test_x), tref,
        tk))[:2]
    out = driver.project_2d_sharded(
        mix, spec, old_mix, 0.025, mesh=mesh, scene=scene,
        adv_domain=scene.advance_domain, test_x=test_x,
        key=jax.random.PRNGKey(7), weights=w, batch_size=64,
        max_epoch=200, check_iter=100, verbose=0)
    lv1, ld1 = jax.device_get(test_fn(
        out.params(), out.alive, pos_org, adv, jnp.asarray(test_x), tref,
        tk))[:2]
    assert np.isfinite(lv1) and np.isfinite(ld1)
    assert ld1 <= ld0 * 1.05 and lv1 <= lv0 * 1.05, (lv0, ld0, lv1, ld1)


def test_sharded_clone_chunk_matches_step(monkeypatch):
    """One epoch through the scanned clone chunk runner must equal the
    one-step shard_map clone epoch fed the identical samples."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.parallel import driver

    n, b_global = 128, 64
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    rng = np.random.RandomState(15)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(r.uniform(-4, 4, (n, 2)), spec,
                                   pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(15), rand_mix(16)
    stop = jnp.asarray(rng.rand(n) < 0.5)
    lrs = {"positions": 1e-2, "scalings": 5e-2, "rotations": 5e-2,
           "values": 5e-3}
    lo = jnp.asarray([-4.0, -4.0])
    hi = jnp.asarray([4.0, 4.0])
    mesh = sharding.make_mesh(4, 2)
    n_batch, b_local = 4, b_global // 4

    run_chunk, place = driver.make_sharded_clone_chunk(spec, mesh,
                                                       b_global)
    opt = optim.init(mix.params(), lrs, patience=50)
    carry = place(mix.params(), opt, mix.alive, stop, old_mix.params(),
                  old_mix.alive, lo, hi)
    key = jax.random.PRNGKey(4)
    carry2, aux = run_chunk(carry, key, 1)
    p_chunk = {k: np.asarray(v) for k, v in carry2[0].items()}

    keys = jax.random.split(key, 1)
    xs = []
    for i in range(n_batch):
        kd = jax.random.fold_in(keys[0], i)
        xs.append(jax.random.uniform(kd, (b_local, 2), jnp.float32)
                  * (hi - lo) + lo)
    x = jnp.concatenate(xs)
    step, splace, data_shard = sharding.make_sharded_clone_step(spec, mesh)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, sstop, sold, sold_alive = splace(
        mix.params(), opt2, mix.alive, stop, old_mix.params(),
        old_mix.alive)
    p_step, _, aux2 = step(sp, sopt, salive, sstop, sold, sold_alive,
                           jax.device_put(x, data_shard))
    np.testing.assert_allclose(np.asarray(aux)[0], np.asarray(aux2),
                               rtol=1e-5, atol=1e-7)
    for k in p_chunk:
        np.testing.assert_allclose(p_chunk[k], np.asarray(p_step[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_clone_velocity_field_sharded_end_to_end(monkeypatch):
    """Full sharded clone (host split + sharded re-fit loop): splits the
    over-stretched Gaussians and re-fits toward the old field on the
    virtual mesh without diverging."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.parallel import driver

    n = 96
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    r = np.random.RandomState(17)
    m = GaussianMixture.create(r.uniform(-4, 4, (n, 2)), spec, pad=False)
    sca = np.array(m.scalings)
    sca[: n // 4, 0] += np.log(2.0)   # stretched -> must split
    old_mix = GaussianMixture(
        m.positions, jnp.asarray(sca), m.rotations,
        jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    xs = np.linspace(-4, 4, 10)
    test_x = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    mesh = sharding.make_mesh(4, 2)
    out = driver.clone_velocity_field_sharded(
        old_mix, spec, mesh=mesh, lo=(-5.0, -5.0), hi=(5.0, 5.0),
        test_x=test_x, key=jax.random.PRNGKey(8), seed=1, d=2,
        batch_size=64, max_epoch=200, check_iter=100, verbose=0)
    assert int(out.n_alive()) == n + n // 4   # 2 children per split parent
    # the re-fit result must approximate the old field
    pts = jnp.asarray(test_x, jnp.float32)
    v_old, _ = field.value_and_jac(old_mix, spec, pts)
    v_new, _ = field.value_and_jac(out, spec, pts)
    err = float(jnp.abs(v_new - v_old).mean())
    assert np.isfinite(err) and err < 0.05, err


def test_full_frame_sharded(monkeypatch):
    """One COMPLETE simulation frame through the multi-chip loops:
    sharded clone re-fit -> advect (host restructuring, as in the
    single-device loop) -> sharded projection. The frame must keep the
    field finite and not inflate the divergence residual."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.advect_field import (
        advect_covector_field_2d)
    from gaussian_fluids_tpu.solver import losses
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = np.asarray(scene.advance_domain, np.float32)
    lo = np.asarray([adv[0], adv[2]]) * sf
    hi = np.asarray([adv[1], adv[3]]) * sf
    n = 96
    spec = FieldSpec.create(tuple(lo), tuple(hi), n, d=2, vdim=2)
    r = np.random.RandomState(19)
    m = GaussianMixture.create(r.uniform(lo * 0.8, hi * 0.8, (n, 2)), spec,
                               pad=False)
    sca = np.array(m.scalings)
    sca[: n // 6, 0] += np.log(2.0)   # some must split in the clone
    cur = GaussianMixture(m.positions, jnp.asarray(sca), m.rotations,
                          jnp.asarray(0.05 * r.randn(n, 2), jnp.float32),
                          m.alive).spatially_sorted()

    xs = np.linspace(lo[0], hi[0], 10)
    ys = np.linspace(lo[1], hi[1], 10)
    test_x = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    mesh = sharding.make_mesh(4, 2)

    new = driver.clone_velocity_field_sharded(
        cur, spec, mesh=mesh, lo=tuple(lo), hi=tuple(hi), test_x=test_x,
        key=jax.random.PRNGKey(21), seed=2, d=2, batch_size=64,
        max_epoch=200, check_iter=100, verbose=0)
    new = advect_covector_field_2d(new, spec, 0.025)
    out = driver.project_2d_sharded(
        new, spec, cur, 0.025, mesh=mesh, scene=scene,
        adv_domain=scene.advance_domain, test_x=test_x,
        key=jax.random.PRNGKey(22), weights=ProjectWeights(),
        batch_size=64, max_epoch=200, check_iter=100, verbose=0)

    pts = jnp.asarray(test_x, jnp.float32)
    _, jac0 = field.value_and_jac(cur, spec, pts)
    _, jac1 = field.value_and_jac(out, spec, pts)
    div0 = float(jnp.abs(losses.divergence(jac0)).mean())
    div1 = float(jnp.abs(losses.divergence(jac1)).mean())
    assert np.isfinite(div1)
    assert div1 <= max(div0, 1e-3) * 2.0, (div0, div1)


def test_sharded_project_chunk_3d_matches_step(monkeypatch):
    """One epoch through the scanned 3D chunk runner must equal the
    one-step shard_map 3D projection epoch fed the identical samples."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.scenes import get_scene_3d
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    n, b_global = 128, 64
    dt = jnp.asarray(0.02, jnp.float32)
    w = ProjectWeights(delta_pos=0.0)
    spec = FieldSpec.create((-5,) * 3, (5,) * 3, n, d=3, vdim=3)
    bs = get_scene_3d("ring_collide").boundary_sampler

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        m = GaussianMixture.create(r.uniform(-4, 4, (n, 3)), spec,
                                   pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 3), jnp.float32)
        rot = jnp.asarray(r.randn(n, 4) * 0.1
                          + np.array([1.0, 0, 0, 0]), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 3), jnp.float32), m.alive)

    mix, old_mix = rand_mix(21), rand_mix(22)
    lrs = {"positions": 3e-4, "scalings": 1e-5, "rotations": 3e-4,
           "values": 1e-5}
    mesh = sharding.make_mesh(4, 2)
    n_batch, b_local = 4, b_global // 4
    lo = jnp.asarray([-5.0] * 3)
    hi = jnp.asarray([5.0] * 3)

    run_chunk, place = driver.make_sharded_project_chunk_3d(
        spec, mesh, "ring_collide", (-5.0,) * 3, (5.0,) * 3, 10.0, w,
        batch_size=b_global)
    opt = optim.init(mix.params(), lrs, patience=50)
    carry = place(mix.params(), opt, mix.alive, old_mix.params(),
                  old_mix.alive, 0.02)
    key = jax.random.PRNGKey(9)
    carry2, ls = run_chunk(carry, key, 1)
    p_chunk = {k: np.asarray(v) for k, v in carry2[0].items()}

    keys = jax.random.split(key, 1)
    datas, bds, bns = [], [], []
    for i in range(n_batch):
        ki = jax.random.fold_in(keys[0], i)
        kd, kb = jax.random.split(ki)
        datas.append(jax.random.uniform(kd, (b_local, 3), jnp.float32)
                     * (hi - lo) + lo)
        bd, bn = bs(kb, b_local)
        bds.append(bd), bns.append(bn)
    step, splace, data_shard = sharding.make_sharded_project_step_3d(
        spec, mesh, boundary_lambda=10.0, weights=w)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, sold, sold_alive = splace(
        mix.params(), opt2, mix.alive, old_mix.params(), old_mix.alive)
    put_b = lambda a: jax.device_put(a, data_shard)
    p_step, _, ls2 = step(sp, sopt, salive, sold, sold_alive, dt,
                          put_b(jnp.concatenate(datas)),
                          put_b(jnp.concatenate(bds)),
                          put_b(jnp.concatenate(bns)))
    np.testing.assert_allclose(np.asarray(ls)[0], np.asarray(ls2),
                               rtol=1e-5, atol=1e-7)
    for k in p_chunk:
        np.testing.assert_allclose(p_chunk[k], np.asarray(p_step[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_project_3d_sharded_runs(monkeypatch):
    """The 3D multi-chip projection host loop runs end to end on the
    virtual mesh with finite, non-growing test losses."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.solver.project import _runner_3d, \
        ProjectWeights

    n = 96
    w = ProjectWeights(delta_pos=0.0)
    spec = FieldSpec.create((-5,) * 3, (5,) * 3, n, d=3, vdim=3)
    r = np.random.RandomState(23)
    m = GaussianMixture.create(r.uniform(-4, 4, (n, 3)), spec, pad=False)
    mix = GaussianMixture(m.positions, m.scalings, m.rotations,
                          jnp.asarray(0.05 * r.randn(n, 3), jnp.float32),
                          m.alive)
    xs = np.linspace(-5, 5, 6)
    test_x = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                      -1).reshape(-1, 3)
    domain = (-5.0, 5.0, -5.0, 5.0, -5.0, 5.0)
    mesh = sharding.make_mesh(4, 2)
    _, test_ref_fn, test_fn, _ = _runner_3d(
        spec, "ring_collide", w, 10.0, 64, (-5.0,) * 3, (5.0,) * 3, None)
    dt = jnp.asarray(0.02, jnp.float32)
    tref = test_ref_fn(mix.params(), mix.alive, jnp.asarray(test_x), dt)
    tk = jax.random.PRNGKey(99)
    lv0, lh0, ld0 = jax.device_get(
        test_fn(mix.params(), mix.alive, jnp.asarray(test_x), tref,
                tk))[:3]
    out = driver.project_3d_sharded(
        mix, spec, mix, 0.02, mesh=mesh, domain=domain, test_x=test_x,
        key=jax.random.PRNGKey(11), scene_name="ring_collide", weights=w,
        batch_size=64, max_epoch=200, check_iter=100, verbose=0)
    lv1, lh1, ld1 = jax.device_get(
        test_fn(out.params(), out.alive, jnp.asarray(test_x), tref,
                tk))[:3]
    assert all(np.isfinite(v) for v in (lv1, lh1, ld1))
    # self-projection from near-zero initial losses: the bound is
    # "stays small" (no divergence), not strict monotonicity
    assert ld1 <= max(float(ld0) * 1.5, 1e-2) and lv1 <= 1e-2, \
        (lv0, ld0, lv1, ld1)


def test_sharded_chunk_runner_karman_matches_step(monkeypatch):
    """Karman chunk runner: the in-graph per-device sampling of BOTH
    boundary samplers (type-1 Dirichlet + type-2 flux) must reproduce the
    one-step epoch fed the identical samples."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gaussian_fluids_tpu.parallel import driver
    from gaussian_fluids_tpu.scenes import get_scene_2d
    from gaussian_fluids_tpu.solver.project import ProjectWeights

    scene = get_scene_2d("karman")
    sf = scene.scaling_factor
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    n, b_global = 128, 64
    dt = jnp.asarray(0.05, jnp.float32)
    w = ProjectWeights()
    spec = FieldSpec.create(tuple(np.asarray(lo)), tuple(np.asarray(hi)),
                            n, d=2, vdim=2)

    def rand_mix(seed):
        r = np.random.RandomState(seed)
        span = np.asarray(hi) - np.asarray(lo)
        m = GaussianMixture.create(
            r.uniform(np.asarray(lo) + 0.1 * span,
                      np.asarray(hi) - 0.1 * span, (n, 2)), spec,
            pad=False)
        sca = m.scalings + jnp.asarray(0.2 * r.randn(n, 2), jnp.float32)
        rot = jnp.asarray(r.uniform(-1, 1, (n,)), jnp.float32)
        return GaussianMixture(
            m.positions, sca, rot,
            jnp.asarray(0.1 * r.randn(n, 2), jnp.float32), m.alive)

    mix, old_mix = rand_mix(25), rand_mix(26)
    lrs = {k: 1e-4 for k in mix.params()}
    mesh = sharding.make_mesh(4, 2)
    n_batch, b_local = 4, b_global // 4

    run_chunk, place = driver.make_sharded_project_chunk_2d(
        spec, mesh, "karman", 1.0, w, batch_size=b_global)
    opt = optim.init(mix.params(), lrs, patience=50)
    carry = place(mix.params(), opt, mix.alive,
                  jax.lax.stop_gradient(mix.positions), old_mix.params(),
                  old_mix.alive, scene.advance_domain, 0.05)
    key = jax.random.PRNGKey(27)
    carry2, ls = run_chunk(carry, key, 1)
    p_chunk = {k: np.asarray(v) for k, v in carry2[0].items()}

    keys = jax.random.split(key, 1)
    datas, bd1s, bval1s, bds, bns, bnrs = [], [], [], [], [], []
    for i in range(n_batch):
        ki = jax.random.fold_in(keys[0], i)
        kd, kb1, kb2 = jax.random.split(ki, 3)
        datas.append(jax.random.uniform(kd, (b_local, 2), jnp.float32)
                     * (hi - lo) + lo)
        bd1, bval1 = scene.boundary_sampler_1(kb1, b_local, adv)
        bd, bn, bnr = scene.boundary_sampler_2(kb2, b_local, adv)
        bd1s.append(bd1), bval1s.append(bval1)
        bds.append(bd), bns.append(bn), bnrs.append(bnr)
    step, splace, data_shard = sharding.make_sharded_project_step_2d(
        spec, mesh, "karman", boundary_lambda=1.0, weights=w)
    opt2 = optim.init(mix.params(), lrs, patience=50)
    sp, sopt, salive, spos, sold, sold_alive = splace(
        mix.params(), opt2, mix.alive,
        jax.lax.stop_gradient(mix.positions), old_mix.params(),
        old_mix.alive)
    put_b = lambda a: jax.device_put(a, data_shard)
    p_step, _, ls2 = step(sp, sopt, salive, spos, sold, sold_alive, adv,
                          dt, put_b(jnp.concatenate(datas)),
                          put_b(jnp.concatenate(bd1s)),
                          put_b(jnp.concatenate(bval1s)),
                          put_b(jnp.concatenate(bds)),
                          put_b(jnp.concatenate(bns)),
                          jax.device_put(jnp.concatenate(bnrs),
                                         NamedSharding(mesh, P("batch"))))
    np.testing.assert_allclose(np.asarray(ls)[0], np.asarray(ls2),
                               rtol=1e-5, atol=1e-7)
    for k in p_chunk:
        np.testing.assert_allclose(p_chunk[k], np.asarray(p_step[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_sharded_density_step_matches_single_device(monkeypatch):
    """One semi-Lagrangian density step over the (batch x gauss) mesh must
    reproduce the single-device advected_density volume (L7 sharded)."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu.parallel import density as pdensity
    from gaussian_fluids_tpu.solver import simulate3d

    n = 64
    domain = (-1.0, 1.0, -1.0, 1.0, -1.0, 1.0)
    spec = FieldSpec.create((-1, -1, -1), (1, 1, 1), n, d=3, vdim=3)
    r = np.random.RandomState(7)
    mix = GaussianMixture.create(r.uniform(-0.8, 0.8, (n, 3)), spec,
                                 pad=False)
    mix = GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                          jnp.asarray(0.3 * r.randn(n, 3), jnp.float32),
                          mix.alive)
    gs = (12, 12, 12)
    dens0 = jnp.asarray(r.rand(*gs), jnp.float32)
    dt = 0.05

    ref = np.asarray(simulate3d.advected_density(
        dens0, mix, spec, domain, dt, gs, chunk=512))
    mesh = sharding.make_mesh(4, 2)
    out = np.asarray(pdensity.advected_density_sharded(
        dens0, mix, spec, domain, dt, gs, mesh, chunk=512))
    assert out.shape == gs
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # the fused value kernel per shard (interpret mode on CPU) — the path
    # real multi-chip TPU runs take, since XLA cannot partition pallas_call
    monkeypatch.setenv("GF_FIELD_BACKEND", "pallas")
    make_sharded_density_step = pdensity.make_sharded_density_step
    make_sharded_density_step.cache_clear()
    simulate3d._grid_chunks_device.cache_clear()
    outp = np.asarray(pdensity.advected_density_sharded(
        dens0, mix, spec, domain, dt, gs, mesh, chunk=512))
    make_sharded_density_step.cache_clear()
    np.testing.assert_allclose(outp, ref, rtol=1e-4, atol=1e-5)


def test_cli_frame_loop_mesh_matches_single_device(monkeypatch, tmp_path):
    """VERDICT r3 item 7: the FULL frame-loop CLI path under --mesh.
    `advance_2d(mesh_shape=cli.parse_mesh("4x2"))` for two frames on the
    virtual mesh must track the single-device run — the splitting +
    repad-under-sharding seam the library-level test_full_frame_sharded
    does not cross (it hand-wires driver calls; this goes through
    cli.parse_mesh -> simulate2d.advance_2d -> parallel.driver)."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    from gaussian_fluids_tpu import cli
    from gaussian_fluids_tpu.io import checkpoint
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.solver.simulate2d import (advance_2d,
                                                       initialize_2d)

    assert cli.parse_mesh("4x2") == (4, 2)
    base = str(tmp_path / "single")
    os.makedirs(base)
    initialize_2d("taylor_green", base, max_epoch=150, viz=False,
                  particle_count=(10, 10), verbose=0)
    shard_dir = str(tmp_path / "sharded")
    os.makedirs(shard_dir)
    import shutil
    shutil.copy(os.path.join(base, "gaussian_velocity_0.pt"),
                os.path.join(shard_dir, "gaussian_velocity_0.pt"))

    advance_2d("taylor_green", base, dt=.001, last_time=.002,
               max_epoch=100, viz=False, verbose=0, test_res=(20, 20))
    advance_2d("taylor_green", shard_dir, dt=.001, last_time=.002,
               max_epoch=100, viz=False, verbose=0, test_res=(20, 20),
               mesh_shape=cli.parse_mesh("4x2"))

    for n in (1, 2):
        assert os.path.exists(
            os.path.join(shard_dir, f"gaussian_velocity_{n}.pt"))
    m1, spec1 = checkpoint.load_checkpoint(
        os.path.join(base, "gaussian_velocity_2.pt"))
    m2, spec2 = checkpoint.load_checkpoint(
        os.path.join(shard_dir, "gaussian_velocity_2.pt"))
    assert spec1 == spec2
    # same splitting decisions -> same Gaussian count (the repad seam)
    assert int(m1.n_alive()) == int(m2.n_alive())
    # the two optimizations differ only by float reduction order; after
    # 2 frames x 100 epochs the FIELDS they converged to must agree to
    # a small fraction of the field scale
    r = np.random.RandomState(3)
    x = jnp.asarray(r.uniform(0.5, 5.5, (128, 2)), jnp.float32)
    v1, _ = field.value_and_jac(m1, spec1, x)
    v2, _ = field.value_and_jac(m2, spec2, x)
    scale = float(jnp.abs(v1).mean())
    err = float(jnp.abs(v1 - v2).mean())
    assert err < 0.05 * scale, (err, scale)
