"""Cross-compatibility with checkpoints AS THE REFERENCE WRITES THEM.

Round-1 tests only proved self round-trip; these fixtures synthesize the
.pt byte-for-byte the way the reference's ``save`` does —
``torch.save(self.parameters(), f)`` of live ``requires_grad`` training
tensors (2D/GSR.py:82,231-240; 3D/GSR.py:181-188) — including the 3D
dtype quirk: 3D positions come from ``torch.tensor(numpy_grid)`` with no
dtype, i.e. float64 (3D/GSR.py:38), while 2D forces float32
(2D/GSR.py:39). Rotations are angle (N,) in 2D and w-first identity
quaternion (N, 4) in 3D (3D/GSR.py:40-42)."""

import os

import jax.numpy as jnp
import numpy as np
import torch

from gaussian_fluids_tpu.io import checkpoint
from gaussian_fluids_tpu.ops import field


def _save_as_reference_2d(path, n=37, seed=0, lo=-5.0, hi=5.0):
    rng = np.random.RandomState(seed)
    pad = 0.1 * (hi - lo)
    # live training tensors exactly as 2D/GSR.py:39-42 creates them
    positions = torch.tensor(rng.uniform(lo + pad, hi - pad, (n, 2)),
                             dtype=torch.float, requires_grad=True)
    scalings = torch.zeros((n, 2), requires_grad=True)
    rotations = torch.zeros(n, requires_grad=True)
    values = torch.zeros((n, 2), requires_grad=True)
    with torch.no_grad():
        scalings += torch.tensor(0.1 * rng.randn(n, 2), dtype=torch.float)
        rotations += torch.tensor(0.2 * rng.randn(n), dtype=torch.float)
        values += torch.tensor(rng.randn(n, 2), dtype=torch.float)
    params = {
        "positions": positions,
        "scalings": scalings,
        "rotations": rotations,
        "values": values,
        "clamp_threshold": 1e-3,              # 2D/GSR.py:173
        "min_grid_scale": 3.0 * np.sqrt((hi - lo) ** 2 / n),  # 2D/GSR.py:177
        "domain_range": (lo, hi, lo, hi),
    }
    torch.save(params, path)
    return params


def _save_as_reference_3d(path, n=29, seed=1):
    rng = np.random.RandomState(seed)
    # 3D/GSR.py:38 — torch.tensor(numpy) with no dtype => float64
    positions = torch.tensor(rng.uniform(-2, 2, (n, 3)), requires_grad=True)
    assert positions.dtype == torch.float64
    scalings = torch.zeros((n, 3), requires_grad=True)
    rotations = torch.zeros((n, 4))
    rotations[:, 0] = 1.0                      # w-first identity, 3D/GSR.py:41
    rotations.requires_grad_()
    values = torch.zeros((n, 3), requires_grad=True)
    with torch.no_grad():
        values += torch.tensor(rng.randn(n, 3), dtype=torch.float)
    params = {
        "positions": positions,
        "scalings": scalings,
        "rotations": rotations,
        "values": values,
        "clamp_threshold": 5e-3,               # 3D/GSR.py:156
        "min_grid_scale": 2.0 * (64.0 / n) ** (1 / 3),  # 3D/GSR.py:160
        "domain_range": (-3.0, 3.0, -3.0, 3.0, -3.0, 3.0),
    }
    torch.save(params, path)
    return params


def test_load_reference_written_2d(tmp_path):
    path = str(tmp_path / "gaussian_velocity_7.pt")
    ref = _save_as_reference_2d(path)
    mix, spec = checkpoint.load_checkpoint(path)
    assert spec.d == 2 and spec.vdim == 2
    assert spec.clamp_threshold == 1e-3
    assert spec.lo == (-5.0, -5.0) and spec.hi == (5.0, 5.0)
    assert int(mix.n_alive()) == 37
    c = mix.compact()
    # loader spatially sorts; compare as sets via lexicographic sort
    got = np.asarray(c.positions)
    want = ref["positions"].detach().numpy()
    order_g = np.lexsort(got.T)
    order_w = np.lexsort(want.T)
    np.testing.assert_allclose(got[order_g], want[order_w], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c.values)[order_g],
        ref["values"].detach().numpy()[order_w], rtol=1e-6)
    assert c.positions.dtype == jnp.float32
    v, j = field.value_and_jac(mix, spec, jnp.zeros((5, 2), jnp.float32))
    assert np.isfinite(np.asarray(v)).all()
    assert np.isfinite(np.asarray(j)).all()


def test_load_reference_written_3d(tmp_path):
    path = str(tmp_path / "gaussian_velocity_0.pt")
    ref = _save_as_reference_3d(path)
    mix, spec = checkpoint.load_checkpoint(path)
    assert spec.d == 3 and spec.vdim == 3
    assert spec.clamp_threshold == 5e-3
    assert int(mix.n_alive()) == 29
    c = mix.compact()
    assert c.positions.dtype == jnp.float32   # float64 input downcast
    assert c.rotations.shape == (c.positions.shape[0], 4)
    got = np.asarray(c.positions)
    want = ref["positions"].detach().numpy().astype(np.float32)
    np.testing.assert_allclose(got[np.lexsort(got.T)],
                               want[np.lexsort(want.T)], rtol=1e-6)
    # identity quaternions survive (w-first)
    np.testing.assert_allclose(np.asarray(c.rotations),
                               np.tile([1, 0, 0, 0], (29, 1)), atol=1e-7)
    v, j = field.value_and_jac(mix, spec, jnp.zeros((5, 3), jnp.float32))
    assert np.isfinite(np.asarray(v)).all()
    assert np.isfinite(np.asarray(j)).all()


def test_resume_from_reference_written_2d(tmp_path):
    """The advance entry must resume (--start_frame) directly from a
    reference-written file, as the reference resumes from its own
    (README.md:127-131)."""
    from gaussian_fluids_tpu.solver.simulate2d import advance_2d

    out = str(tmp_path)
    # reference-written frame 0 on taylor_green's scaled advance domain
    # ((0, 2*pi) * scaling_factor = (0, 10))
    _save_as_reference_2d(os.path.join(out, "gaussian_velocity_0.pt"),
                          n=64, seed=3, lo=0.0, hi=10.0)
    advance_2d("taylor_green", out, dt=.001, last_time=.001, max_epoch=60,
               viz=False, verbose=0, test_res=(12, 12))
    assert os.path.exists(os.path.join(out, "gaussian_velocity_1.pt"))


def test_unnormalized_quaternion_parity(tmp_path):
    """A real mid-run reference checkpoint holds quaternions that drift off
    unit norm — the reference never renormalizes the stored tensor, its
    kernels normalize in-function per evaluation (3D/GSR.py:97-99). Load a
    checkpoint with deliberately non-unit (tiny to huge norm) quaternions
    and assert field parity against a torch oracle implementing the
    reference fast-path semantics (v*(g - c) for g >= c, 3D/GSR.py:294)
    with the same in-function normalization."""
    n, seed = 23, 7
    rng = np.random.RandomState(seed)
    path = str(tmp_path / "gaussian_velocity_4.pt")
    quats = rng.randn(n, 4)
    # degenerate norms: tiny, unit-ish, huge — but never zero
    quats *= (10.0 ** rng.uniform(-1.5, 1.5, (n, 1))
              / np.linalg.norm(quats, axis=1, keepdims=True))
    assert np.abs(np.linalg.norm(quats, axis=1) - 1.0).max() > 5.0
    params = {
        "positions": torch.tensor(rng.uniform(-1, 1, (n, 3)),
                                  dtype=torch.float, requires_grad=True),
        "scalings": torch.tensor(0.3 * rng.randn(n, 3), dtype=torch.float,
                                 requires_grad=True),
        "rotations": torch.tensor(quats, dtype=torch.float,
                                  requires_grad=True),
        "values": torch.tensor(rng.randn(n, 3), dtype=torch.float,
                               requires_grad=True),
        "clamp_threshold": 5e-3,
        "min_grid_scale": 2.0 * (64.0 / n) ** (1 / 3),
        "domain_range": (-3.0, 3.0, -3.0, 3.0, -3.0, 3.0),
    }
    torch.save(params, path)

    mix, spec = checkpoint.load_checkpoint(path)
    x = rng.uniform(-1.5, 1.5, (64, 3)).astype(np.float32)
    got = np.asarray(field.value(mix, spec, jnp.asarray(x), need_dx=False))

    # torch oracle (reference dense math with fast-path clamp semantics)
    with torch.no_grad():
        q = params["rotations"] / params["rotations"].norm(
            dim=-1, keepdim=True)
        r, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = torch.stack([
            torch.stack([1 - 2 * (qy * qy + qz * qz),
                         2 * (qx * qy - r * qz),
                         2 * (qx * qz + r * qy)], -1),
            torch.stack([2 * (qx * qy + r * qz),
                         1 - 2 * (qx * qx + qz * qz),
                         2 * (qy * qz - r * qx)], -1),
            torch.stack([2 * (qx * qz - r * qy),
                         2 * (qy * qz + r * qx),
                         1 - 2 * (qx * qx + qy * qy)], -1)], -2)
        e2s = torch.exp(2.0 * params["scalings"])
        P = torch.einsum("nik,nk,njk->nij", R, e2s, R)
        delta = torch.tensor(x)[:, None, :] - params["positions"][None]
        quad = torch.einsum("bni,nij,bnj->bn", delta, P, delta)
        g = torch.exp(-0.5 * quad)
        c = params["clamp_threshold"]
        want = torch.einsum(
            "bn,nd->bd", torch.where(g >= c, g - c, torch.zeros(())),
            params["values"]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
