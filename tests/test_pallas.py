"""Fused Pallas kernel vs the dense XLA path (interpret mode on CPU;
the same tests validate the compiled kernel when run on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field


def _mix(n, d, seed):
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-5,) * d, (5,) * d, n, d=d, vdim=d)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, d)), spec)
    sca = mix.scalings + jnp.asarray(
        rng.uniform(-0.3, 0.3, mix.scalings.shape), jnp.float32)
    rot = mix.rotations + jnp.asarray(
        rng.uniform(-1, 1, mix.rotations.shape), jnp.float32)
    val = jnp.asarray(rng.randn(*mix.values.shape) *
                      np.asarray(mix.alive)[:, None], jnp.float32)
    return GaussianMixture(mix.positions, sca, rot, val, mix.alive), spec


def test_backend_dispatch_env(monkeypatch):
    mix, spec = _mix(40, 2, seed=1)
    x = jnp.asarray(np.random.RandomState(2).uniform(-4, 4, (16, 2)),
                    jnp.float32)
    monkeypatch.setenv("GF_FIELD_BACKEND", "pallas")
    v_p, j_p = field.value_and_jac(mix, spec, x)
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    v_d, j_d = field.value_and_jac(mix, spec, x)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_p), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_centered_kernel_matches_dense(d):
    mix, spec = _mix(100, d, seed=d + 20)
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.uniform(-5, 5, (70, d)), jnp.float32)
    v_d, j_d = field.value_and_jac_dense(mix, spec, x)
    v_c, j_c = field.value_and_jac_centered(mix, spec, x, tb=64, tn=256)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_centered_kernel_gradients(d):
    mix, spec = _mix(80, d, seed=d + 30)
    rng = np.random.RandomState(19)
    x = jnp.asarray(rng.uniform(-4, 4, (64, d)), jnp.float32)

    def loss(p, impl):
        m = mix.with_params(p)
        v, j = impl(m, spec, x)
        return jnp.abs(v).mean() + jnp.abs(j).mean() + (v * v).mean()

    gd = jax.grad(lambda p: loss(p, field.value_and_jac_dense))(mix.params())
    gc = jax.grad(lambda p: loss(
        p, lambda m, s, q: field.value_and_jac_centered(m, s, q, tb=64,
                                                        tn=256)))(mix.params())
    for k in gd:
        np.testing.assert_allclose(np.asarray(gc[k]), np.asarray(gd[k]),
                                   rtol=5e-3, atol=1e-5, err_msg=k)

    # gradient w.r.t. query points (RK4 differentiability)
    gx_d = jax.grad(lambda q: field.value_and_jac_dense(
        mix, spec, q)[1].sum())(x)
    gx_c = jax.grad(lambda q: field.value_and_jac_centered(
        mix, spec, q, tb=64, tn=256)[1].sum())(x)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_d),
                               rtol=5e-3, atol=1e-4)


def test_centered_kernel_dead_and_padding():
    mix, spec = _mix(60, 2, seed=29)
    alive = mix.alive.at[10:20].set(False)
    pos = mix.positions.at[25:30].set(jnp.asarray([50.0, 50.0]))
    mix2 = GaussianMixture(pos, mix.scalings, mix.rotations, mix.values,
                           alive)
    x = jnp.asarray(np.random.RandomState(1).uniform(-4, 4, (33, 2)),
                    jnp.float32)
    v_d, j_d = field.value_and_jac_dense(mix2, spec, x)
    v_c, j_c = field.value_and_jac_centered(mix2, spec, x, tb=64, tn=256)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_centered_value_only(d):
    mix, spec = _mix(90, d, seed=d + 40)
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.uniform(-5, 5, (70, d)), jnp.float32)
    v_d = field.value_dense(mix, spec, x)
    v_c = field.value_centered(mix, spec, x, tb=64, tn=256)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    gd = jax.grad(lambda p: jnp.abs(field.value_dense(
        mix.with_params(p), spec, x)).mean())(mix.params())
    gc = jax.grad(lambda p: jnp.abs(field.value_centered(
        mix.with_params(p), spec, x, tb=64, tn=256)).mean())(mix.params())
    for k in gd:
        np.testing.assert_allclose(np.asarray(gc[k]), np.asarray(gd[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=k)


def test_centered_sparse_outlier_gaussian():
    # one huge Gaussian whose support spans the domain must never be
    # culled by the tile mask
    mix, spec = _mix(70, 2, seed=51)
    sca = mix.scalings.at[7].set(jnp.asarray([-2.5, -2.5]))  # huge radius
    mix2 = GaussianMixture(mix.positions, sca, mix.rotations, mix.values,
                           mix.alive)
    x = jnp.asarray(np.random.RandomState(5).uniform(-5, 5, (100, 2)),
                    jnp.float32)
    v_d, j_d = field.value_and_jac_dense(mix2, spec, x)
    v_c, j_c = field.value_and_jac_centered(mix2, spec, x, tb=64, tn=256)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


def test_banded_value_matches_dense():
    mix, spec = _mix(128, 3, seed=61)
    # coherent (grid-like) queries, as in the density backtrace
    g = np.linspace(-4.5, 4.5, 6).astype(np.float32)
    x = jnp.asarray(np.stack(np.meshgrid(g, g, g, indexing="ij"),
                             -1).reshape(-1, 3))
    v_d = field.value_dense(mix, spec, x)
    nnt = -(-mix.capacity // 256)
    for band in (nnt, max(1, nnt - 1)):
        v_b = field.value_banded(mix, spec, x, band, tb=64, tn=256)
        np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_d),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=f"band={band}")


def test_banded_value_insufficient_band_falls_back_exactly():
    """A band too narrow for the actual Gaussian spread must NOT silently
    drop contributions: the on-device window guard falls back to the full
    masked sweep and the result stays exact."""
    mix, spec = _mix(128, 3, seed=61)
    g = np.linspace(-4.5, 4.5, 6).astype(np.float32)
    x = jnp.asarray(np.stack(np.meshgrid(g, g, g, indexing="ij"),
                             -1).reshape(-1, 3))
    v_d = field.value_dense(mix, spec, x)
    # unsorted random Gaussians span every tile; band=1 cannot cover them
    v_b = field.value_banded(mix, spec, x, 1, tb=64, tn=256)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)


def test_banded_value_presorted():
    mix, spec = _mix(100, 2, seed=67)
    x = np.random.RandomState(3).uniform(-5, 5, (80, 2)).astype(np.float32)
    xs = x[np.argsort(x[:, 0])]
    nnt = -(-mix.capacity // 256)
    v_b = field.value_banded(mix, spec, jnp.asarray(xs), nnt, tb=64,
                             tn=256, presorted=True)
    v_d = field.value_dense(mix, spec, jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)


def test_centered_need_dx_false_param_grads():
    mix, spec = _mix(80, 3, seed=71)
    x = jnp.asarray(np.random.RandomState(9).uniform(-4, 4, (64, 3)),
                    jnp.float32)

    def loss(p, **kw):
        m = mix.with_params(p)
        v, j = field.value_and_jac_centered(m, spec, x, tb=64, tn=256, **kw)
        return jnp.abs(v).mean() + jnp.abs(j).mean()

    g1 = jax.grad(lambda p: loss(p))(mix.params())
    g2 = jax.grad(lambda p: loss(p, need_dx=False))(mix.params())
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-6, atol=0, err_msg=k)


@pytest.mark.parametrize("sparse", ["0", "1"])
@pytest.mark.parametrize("presorted", [False, True])
def test_centered_env_matrix(monkeypatch, sparse, presorted):
    """All (GF_SPARSE, presorted) combinations agree with the dense path.
    presorted=True on unsorted input must still be CORRECT (it is only a
    tile-tightness hint)."""
    monkeypatch.setenv("GF_SPARSE", sparse)
    mix, spec = _mix(90, 2, seed=83)
    x = jnp.asarray(np.random.RandomState(4).uniform(-4, 4, (48, 2)),
                    jnp.float32)
    if presorted:
        x = x[jnp.argsort(x[:, 0])]
    v_d, j_d = field.value_and_jac_dense(mix, spec, x)
    v_c, j_c = field.value_and_jac_centered(mix, spec, x, tb=64, tn=256,
                                            presorted=presorted)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)
    v_o = field.value_centered(mix, spec, x, tb=64, tn=256,
                               presorted=presorted)
    np.testing.assert_allclose(np.asarray(v_o), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_two_head_grads_dual_backward_matches_vjp(d):
    """The dual-cotangent backward (one shared tile sweep for the PCGrad
    heads) must agree with two independent jax.vjp pullbacks on the dense
    path — including dead/out-of-domain Gaussians."""
    mix, spec = _mix(80, d, seed=d + 50)
    alive = mix.alive.at[5:12].set(False)
    pos = mix.positions.at[20:23].set(50.0)
    mix = GaussianMixture(pos, mix.scalings, mix.rotations, mix.values,
                          alive)
    x = np.random.RandomState(8).uniform(-4, 4, (48, d)).astype(np.float32)
    x = jnp.asarray(x[np.argsort(x[:, 0])])
    params = mix.params()

    def head1(val, jac):
        return jnp.abs(jac).mean() + (val * val).mean()

    def head2(val, jac):
        return (jnp.trace(jac, axis1=-2, axis2=-1) ** 2).mean()

    def heads(p):
        m = mix.with_params(p)
        val, jac = field.value_and_jac_dense(m, spec, x)
        return head1(val, jac), head2(val, jac)

    (l1_d, l2_d), vjp = jax.vjp(heads, params)
    g1_d = vjp((jnp.ones(()), jnp.zeros(())))[0]
    g2_d = vjp((jnp.zeros(()), jnp.ones(())))[0]

    (l1, l2), (g1, g2) = field.two_head_grads_centered(
        params, mix.alive, spec, x, head1, head2, tb=64, tn=256)
    np.testing.assert_allclose(float(l1), float(l1_d), rtol=1e-4)
    np.testing.assert_allclose(float(l2), float(l2_d), rtol=1e-4)
    for k in g1_d:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g1_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g1.{k}")
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g2_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g2.{k}")


def test_two_head_grads_jac_only_skip_matches_vjp():
    """heads_use_val=False (2D vor/div: jac-only heads) must produce the
    same gradients as the dense two-vjp reference."""
    mix, spec = _mix(80, 2, seed=31)
    x = np.random.RandomState(4).uniform(-4, 4, (48, 2)).astype(np.float32)
    x = jnp.asarray(x[np.argsort(x[:, 0])])
    params = mix.params()

    def head1(val, jac):
        return jnp.abs(jac[:, 1, 0] - jac[:, 0, 1]).mean()

    def head2(val, jac):
        return ((jac[:, 0, 0] + jac[:, 1, 1]) ** 2).mean()

    def heads(p):
        m = mix.with_params(p)
        val, jac = field.value_and_jac_dense(m, spec, x)
        return head1(val, jac), head2(val, jac)

    (l1_d, l2_d), vjp = jax.vjp(heads, params)
    g1_d = vjp((jnp.ones(()), jnp.zeros(())))[0]
    g2_d = vjp((jnp.zeros(()), jnp.ones(())))[0]
    (l1, l2), (g1, g2) = field.two_head_grads_centered(
        params, mix.alive, spec, x, head1, head2, tb=64, tn=256,
        heads_use_val=False)
    np.testing.assert_allclose(float(l1), float(l1_d), rtol=1e-4)
    np.testing.assert_allclose(float(l2), float(l2_d), rtol=1e-4)
    for k in g1_d:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g1_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g1.{k}")
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g2_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g2.{k}")


def test_two_head_grads_dispatch(monkeypatch):
    """Both backends of the dispatching two_head_grads agree."""
    mix, spec = _mix(60, 2, seed=77)
    x = np.random.RandomState(2).uniform(-4, 4, (32, 2)).astype(np.float32)
    x = jnp.asarray(x[np.argsort(x[:, 0])])
    params = mix.params()
    h1 = lambda val, jac: jnp.abs(val).mean()
    h2 = lambda val, jac: jnp.abs(jac).sum()
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    (a1, a2), (ga1, ga2) = field.two_head_grads(params, mix.alive, spec, x,
                                                h1, h2)
    monkeypatch.setenv("GF_FIELD_BACKEND", "pallas")
    (b1, b2), (gb1, gb2) = field.two_head_grads(params, mix.alive, spec, x,
                                                h1, h2)
    np.testing.assert_allclose(float(b1), float(a1), rtol=1e-4)
    np.testing.assert_allclose(float(b2), float(a2), rtol=1e-4)
    for k in ga1:
        np.testing.assert_allclose(np.asarray(gb1[k]), np.asarray(ga1[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(gb2[k]), np.asarray(ga2[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=k)


def test_centered_presorted_lie_is_still_correct():
    """An untrue presorted promise loosens tile bounds but never drops a
    contributing pair (the mask uses actual tile extents)."""
    mix, spec = _mix(80, 3, seed=91)
    x = jnp.asarray(np.random.RandomState(6).uniform(-4, 4, (40, 3)),
                    jnp.float32)  # NOT sorted
    v_d, j_d = field.value_and_jac_dense(mix, spec, x)
    v_c, j_c = field.value_and_jac_centered(mix, spec, x, tb=64, tn=256,
                                            presorted=True)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_d),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_c), np.asarray(j_d),
                               rtol=1e-3, atol=1e-5)


def test_fused_rk4_matches_staged():
    """The single-launch fused RK4 kernel (4 stages + endpoint val/jac in
    VMEM) must match the staged pos-only RK4 + dense endpoint eval."""
    from gaussian_fluids_tpu.ops.advect import rk4_advect_pos
    mix, spec = _mix(90, 2, seed=7)
    p = mix.params()
    rng = np.random.RandomState(1)
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    mix = mix.with_params(p)
    x = jnp.asarray(rng.uniform(-4, 4, (48, 2)).astype(np.float32))
    for dt in (-0.05, 0.08):
        phi_ref = rk4_advect_pos(mix, spec, x, dt)
        val_ref, jac_ref = field.value_and_jac_dense(mix, spec, phi_ref)
        phi, val, jac = field.rk4_valjac_fused(mix, spec, x, dt, tb=16,
                                               tn=256)
        np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(val), np.asarray(val_ref),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref),
                                   rtol=1e-3, atol=1e-5)


def test_covector_2d_fused_matches_staged(monkeypatch):
    """advected_vorticity_2d must agree between the fused-RK4 dispatch and
    the staged path."""
    from gaussian_fluids_tpu.solver import covector
    mix, spec = _mix(90, 2, seed=3)
    p = mix.params()
    rng = np.random.RandomState(2)
    p["values"] = jnp.asarray(
        0.3 * rng.randn(*p["values"].shape).astype(np.float32))
    mix = mix.with_params(p)
    x = jnp.asarray(np.sort(rng.uniform(-4, 4, (64, 2)).astype(np.float32),
                            axis=0))
    lo, hi = jnp.asarray([-5.0, -5.0]), jnp.asarray([5.0, 5.0])
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    a = covector.advected_vorticity_2d(mix, spec, x, 0.05, lo, hi,
                                       presorted=True)
    monkeypatch.setenv("GF_FIELD_BACKEND", "pallas")
    b = covector.advected_vorticity_2d(mix, spec, x, 0.05, lo, hi,
                                       presorted=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                               atol=1e-5)


@pytest.mark.parametrize("d", [2, 3])
def test_epoch_heads_grads_triple_backward_matches_vjp(d):
    """The fused [data; boundary] triple-cotangent backward must agree
    with dense jax.vjp basis pullbacks — losses and all three gradients."""
    mix, spec = _mix(80, d, seed=d + 60)
    rng = np.random.RandomState(9)
    x = rng.uniform(-4, 4, (48, d)).astype(np.float32)
    x = jnp.asarray(x[np.argsort(x[:, 0])])
    xb = rng.uniform(-4.5, 4.5, (32, d)).astype(np.float32)
    xb = jnp.asarray(xb[np.argsort(xb[:, 0])])
    bn = jnp.asarray(rng.randn(32, d).astype(np.float32))
    params = mix.params()
    use_val = d == 3

    def head1(val, jac):
        core = jnp.abs(jac).mean()
        return core + (val * val).mean() if use_val else core

    def head2(val, jac):
        return (jnp.trace(jac, axis1=-2, axis2=-1) ** 2).mean()

    def head_bnd(vb):
        return jnp.abs(jnp.sum(vb * bn, axis=-1)).mean()

    def heads(p):
        m = mix.with_params(p)
        val, jac = field.value_and_jac_dense(m, spec, x)
        vb = field.value_dense(m, spec, xb)
        return head1(val, jac), head2(val, jac), head_bnd(vb)

    z, o = jnp.zeros(()), jnp.ones(())
    (l1_d, l2_d, lb_d), vjp = jax.vjp(heads, params)
    g1_d = vjp((o, z, z))[0]
    g2_d = vjp((z, o, z))[0]
    gb_d = vjp((z, z, o))[0]

    (l1, l2, lb), (g1, g2, gb) = field.epoch_heads_grads_centered(
        params, mix.alive, spec, x, xb, head1, head2, head_bnd,
        heads_use_val=use_val, tb=16, tn=256)
    np.testing.assert_allclose(float(l1), float(l1_d), rtol=1e-4)
    np.testing.assert_allclose(float(l2), float(l2_d), rtol=1e-4)
    np.testing.assert_allclose(float(lb), float(lb_d), rtol=1e-4)
    for k in g1_d:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g1_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g1.{k}")
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g2_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"g2.{k}")
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(gb_d[k]),
                                   rtol=5e-3, atol=1e-6, err_msg=f"gb.{k}")
