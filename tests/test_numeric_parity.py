"""Numeric-drift regression gates (VERDICT r1 item 7).

1. A float64 ORACLE bound on one FULL production projection epoch: the
   epoch (RK4 covector target -> two loss heads -> PCGrad -> boundary +
   regularizer grads -> 4-group Adam) is re-derived self-contained in
   float64 from the reference formulas (dense field math + jax.grad — no
   shared kernels, no custom VJPs), fed the production epoch's exact
   sample draws, and the params-out delta is bounded. Any backend change
   that silently degrades the epoch numerics breaks this gate.
   Measured slack on this state: max |delta| ~1e-7; gate at 1e-5.

2. Golden-frame determinism: the same fixed-seed 2-frame run must be
   bit-identical when repeated (deterministic XLA reductions replace the
   reference's nondeterministic Taichi atomics, SURVEY.md §4.5).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.scenes import get_scene_2d
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import (ProjectWeights, _runner_2d,
                                                _uniform_batch,
                                                DEFAULT_LRS_2D)

BATCH = 64
DT = 0.025


def _state(n=96, seed=5):
    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-5 * sf,) * 2, (5 * sf,) * 2, n, d=2, vdim=2)
    mix = GaussianMixture.create(rng.uniform(-4 * sf, 4 * sf, (n, 2)), spec,
                                 pad=False)
    params = mix.params()
    params["values"] = jnp.asarray(0.3 * rng.randn(n, 2), jnp.float32)
    params["scalings"] = params["scalings"] + jnp.asarray(
        0.2 * rng.randn(n, 2), jnp.float32)
    return scene, spec, mix.with_params(params)


def test_projection_epoch_matches_float64_oracle(monkeypatch):
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    scene, spec, mix = _state()
    sf = scene.scaling_factor
    params = mix.params()
    w = ProjectWeights()
    run_chunk = _runner_2d(spec, "leapfrog", w, 1.0, BATCH, None)[0]
    opt_state = optim.init(params, DEFAULT_LRS_2D, patience=50)
    adv = jnp.asarray(scene.advance_domain, jnp.float32)
    dtj = jnp.asarray(DT, jnp.float32)
    pos_org = jax.lax.stop_gradient(mix.positions)
    carry = (params, opt_state, mix.alive, pos_org, mix.params(), mix.alive,
             adv, dtj)
    key = jax.random.PRNGKey(7)
    carry2, _ = run_chunk(carry, key, 1)
    p32 = {k: np.asarray(v) for k, v in carry2[0].items()}

    # replicate the epoch's exact draws (solver/project.py _runner_2d)
    ekey = jax.random.split(key, 1)[0]
    kd, kb1, kb2 = jax.random.split(ekey, 3)
    lo = jnp.stack([adv[0], adv[2]]) * sf
    hi = jnp.stack([adv[1], adv[3]]) * sf
    data32 = np.asarray(_uniform_batch(kd, BATCH, lo, hi))
    bd32, bn32, bnr32 = (np.asarray(a) for a in
                         scene.boundary_sampler_2(kb2, BATCH, adv))

    p64 = _oracle_epoch_f64(
        {k: np.asarray(v) for k, v in params.items()},
        np.asarray(mix.alive), spec, w, data32, bd32, bn32, bnr32,
        np.asarray(pos_org), np.asarray(lo), np.asarray(hi))

    for k in p32:
        d = np.abs(p32[k] - p64[k])
        assert d.max() < 1e-5, (k, d.max())
        assert d.mean() < 1e-6, (k, d.mean())


def _oracle_epoch_f64(params_np, alive_np, spec, w, data, bd, bn, bnr,
                      porg_np, lo_np, hi_np):
    """Self-contained float64 epoch from the reference formulas
    (2D/advance.py:187-302 semantics: rk4 covector target zeroed outside
    the advance domain, L1 vor / squared div heads, PCGrad, flux boundary,
    aniso/vol/delta-pos regularizers, bias-corrected Adam step 1)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        f64 = jnp.float64
        P0 = {k: jnp.asarray(v, f64) for k, v in params_np.items()}
        alive = jnp.asarray(alive_np)
        x = jnp.asarray(data, f64)
        bdj, bnj, bnrj = (jnp.asarray(a, f64) for a in (bd, bn, bnr))
        porg = jnp.asarray(porg_np, f64)
        lo, hi = jnp.asarray(lo_np, f64), jnp.asarray(hi_np, f64)
        slo, shi = jnp.asarray(spec.lo, f64), jnp.asarray(spec.hi, f64)
        clamp = float(spec.clamp_threshold)

        def prec(p):
            s, r = p["scalings"], p["rotations"]
            c, sn = jnp.cos(r), jnp.sin(r)
            R = jnp.stack([jnp.stack([c, -sn], -1),
                           jnp.stack([sn, c], -1)], -2)
            A = R @ jax.vmap(jnp.diag)(jnp.exp(s))
            return A @ jnp.swapaxes(A, -1, -2)

        def val_jac(p, q):
            Pm = prec(p)
            delta = q[:, None, :] - p["positions"][None, :, :]
            Pd = jnp.einsum("nij,bnj->bni", Pm, delta)
            quad = jnp.einsum("bni,bni->bn", delta, Pd)
            g = jnp.exp(-0.5 * quad)
            inside = jnp.all((p["positions"] >= slo)
                             & (p["positions"] <= shi), -1)
            mask = (g >= clamp) & (alive & inside)[None, :]
            mg = jnp.where(mask, g, 0.0)
            mgv = jnp.where(mask, g - clamp, 0.0)
            return mgv @ p["values"], -jnp.einsum("bn,na,bnk->bak", mg,
                                                  p["values"], Pd)

        def vel(q):
            return val_jac(P0, q)[0]

        v = vel(x)
        v1 = vel(x - DT * 0.5 * v)
        v2 = vel(x - DT * 0.5 * v1)
        v3 = vel(x - DT * v2)
        bk = x - DT / 6.0 * (v + 2 * v1 + 2 * v2 + v3)
        jb = val_jac(P0, bk)[1]
        inside_b = jnp.all((bk >= lo) & (bk <= hi), -1)
        ref_vor = jnp.where(inside_b, jb[:, 1, 0] - jb[:, 0, 1], 0.0)

        def head_vor(p):
            j = val_jac(p, x)[1]
            return w.vor * jnp.abs(j[:, 1, 0] - j[:, 0, 1] - ref_vor).mean()

        def head_div(p):
            j = val_jac(p, x)[1]
            return w.div * ((j[:, 0, 0] + j[:, 1, 1]) ** 2).mean()

        def mmean(t, m):
            return jnp.sum(jnp.where(m, t, 0.0)) / jnp.maximum(jnp.sum(m), 1)

        def rest(p):
            s = p["scalings"]
            ratio = jnp.exp(s.max(-1) - s.min(-1))
            aniso = mmean(jnp.maximum(ratio, 1.5) - 1.5, alive)
            volv = jnp.exp(-s.sum(-1))
            vol = mmean((volv / mmean(volv, alive) - 1.0) ** 2, alive)
            dp = mmean(((p["positions"] - porg) ** 2).mean(-1), alive)
            flux = jnp.sum(val_jac(p, bdj)[0] * bnj, axis=1)
            return (w.aniso * aniso + w.vol * vol + w.delta_pos * dp
                    + 1.0 * jnp.abs(flux - bnrj).mean())

        g_vor = jax.grad(head_vor)(P0)
        g_div = jax.grad(head_div)(P0)
        g_rest = jax.grad(rest)(P0)

        def pcg(a, b):
            dot = jnp.vdot(a, b)
            na = a / jnp.maximum(jnp.linalg.norm(a), 1e-30)
            nb = b / jnp.maximum(jnp.linalg.norm(b), 1e-30)
            proj = (a - jnp.vdot(a, nb) * nb) + (b - jnp.vdot(b, na) * na)
            return jnp.where(dot < 0, proj, a + b)

        out = {}
        for k in P0:
            g = g_rest[k] + pcg(g_vor[k], g_div[k])
            mhat = (0.1 * g) / (1 - 0.9)
            vhat = (0.001 * g * g) / (1 - 0.999)
            out[k] = np.asarray(P0[k] - DEFAULT_LRS_2D[k] * mhat
                                / (jnp.sqrt(vhat) + 1e-8))
        return out
    finally:
        jax.config.update("jax_enable_x64", prev)


@pytest.mark.slow
def test_golden_frame_determinism(tmp_path, monkeypatch):
    """Fixed-seed 2-frame Taylor-Green runs are bit-identical when
    repeated (reference analog: its seeds 2D/GSR.py:25-28 could not give
    this — Taichi atomic scatter order is nondeterministic)."""
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    import shutil

    import torch

    from gaussian_fluids_tpu.solver.simulate2d import advance_2d, \
        initialize_2d

    base = str(tmp_path / "init")
    initialize_2d("taylor_green", base, max_epoch=120, viz=False,
                  particle_count=(8, 8), verbose=0)
    dirs = [str(tmp_path / "a"), str(tmp_path / "b")]
    for d in dirs:
        shutil.copytree(base, d)
        advance_2d("taylor_green", d, dt=.001, last_time=.002,
                   max_epoch=100, viz=False, verbose=0, test_res=(10, 10))
    for frame in (1, 2):
        a = torch.load(os.path.join(dirs[0], f"gaussian_velocity_{frame}.pt"),
                       map_location="cpu", weights_only=False)
        b = torch.load(os.path.join(dirs[1], f"gaussian_velocity_{frame}.pt"),
                       map_location="cpu", weights_only=False)
        for k in ("positions", "scalings", "rotations", "values"):
            assert torch.equal(a[k], b[k]), (frame, k)
