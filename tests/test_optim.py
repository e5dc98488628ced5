"""Optimizer semantics cross-checked against torch (Adam +
ReduceLROnPlateau are the reference's exact update rules,
reference 2D/GSR.py:50-58)."""

import numpy as np
import jax.numpy as jnp
import torch

from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.losses import pcgrad_combine


def test_adam_plateau_matches_torch():
    rng = np.random.RandomState(0)
    p0 = rng.randn(7, 3).astype(np.float32)
    grads = [rng.randn(7, 3).astype(np.float32) for _ in range(40)]
    # metrics chosen to trigger several plateau reductions (patience=3)
    metrics = [1.0, 0.5, 0.49, 0.499, 0.51, 0.52, 0.53, 0.54] + [0.6] * 32

    # torch side
    tp = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.Adam([tp], lr=1e-2)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=.9,
                                                       patience=3)
    for g, m in zip(grads, metrics):
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
        sched.step(m)

    # ours
    params = {"p": jnp.asarray(p0)}
    state = optim.init(params, {"p": 1e-2}, patience=3)
    for g, m in zip(grads, metrics):
        params, state = optim.step(state, params, {"p": jnp.asarray(g)},
                                   jnp.asarray(m, jnp.float32))

    np.testing.assert_allclose(np.asarray(params["p"]),
                               tp.detach().numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(state.groups["p"].lr),
                               opt.param_groups[0]["lr"], rtol=1e-6)


def test_pcgrad_no_conflict_is_sum():
    g1 = {"a": jnp.asarray([1.0, 0.0])}
    g2 = {"a": jnp.asarray([1.0, 1.0])}
    out = pcgrad_combine(g1, g2)
    np.testing.assert_allclose(np.asarray(out["a"]), [2.0, 1.0], atol=1e-6)


def test_pcgrad_conflict_projects():
    # reference gradient_project (2D/advance.py:188-193)
    g1 = np.array([1.0, 0.2], np.float32)
    g2 = np.array([-1.0, 0.3], np.float32)
    n1 = g1 / np.linalg.norm(g1)
    n2 = g2 / np.linalg.norm(g2)
    exp = (g1 - (g1 @ n2) * n2) + (g2 - (g2 @ n1) * n1)
    out = pcgrad_combine({"a": jnp.asarray(g1)}, {"a": jnp.asarray(g2)})
    np.testing.assert_allclose(np.asarray(out["a"]), exp, rtol=1e-5)


def test_pcgrad_zero_grad_safe():
    g1 = {"a": jnp.zeros(3)}
    g2 = {"a": jnp.asarray([1.0, 2.0, 3.0])}
    out = pcgrad_combine(g1, g2)
    assert np.all(np.isfinite(np.asarray(out["a"])))
    np.testing.assert_allclose(np.asarray(out["a"]), [1.0, 2.0, 3.0],
                               atol=1e-6)


def test_rng_split_helpers_match_eager():
    """utils.rng.split2/split3 are the jitted twins of jax.random.split."""
    import jax
    from gaussian_fluids_tpu.utils import rng as rng_utils
    key = jax.random.PRNGKey(42)
    a = jax.random.split(key)
    k2, s2 = rng_utils.split2(key)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(s2))
    b = jax.random.split(key, 3)
    k3, s3a, s3b = rng_utils.split3(key)
    np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(k3))
    np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(s3a))
    np.testing.assert_array_equal(np.asarray(b[2]), np.asarray(s3b))
