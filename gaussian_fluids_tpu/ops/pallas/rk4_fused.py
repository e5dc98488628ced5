"""Fused RK4 point-advection Pallas kernel.

The 2D covector target (reference AdvectedCovectorField.vorticity,
2D/advance.py:46-54) RK4-backtraces the batch and evaluates the velocity
Jacobian at the endpoint: five separate field evaluations, each a kernel
launch whose intermediate positions round-trip through HBM. This kernel
runs all of it in ONE launch: the grid is (B/tb, 5, N/tn) — query tile x
RK4 stage x Gaussian tile — with the per-tile stage positions and the
stage velocities v0..v3 held in VMEM scratch across grid steps (TPU grid
iteration is sequential, the same persistence the accumulator kernels in
gsr_centered.py rely on). Gaussian tiles stream through VMEM in standard
(tb, tn) blocks, so VMEM use is independent of N.

Stages 0-3 accumulate the velocity at the current stage position; at each
stage's last Gaussian tile the next stage position is formed. Stage 4
evaluates (value, jacobian) at the endpoint.

Forward-only by design: the covector target is wrapped in stop_gradient and
position-only advection (reference pos_only=True, 2D/GSR.py:560-564) takes
no gradients. Velocity fields only (vdim == d): the stages feed positions.

No block-sparse tile skipping: a start-position tile mask is not exact for
drifted stage positions; per-stage culled launches remain the right tool
where sparsity dominates (see the dispatch in solver/covector.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_fluids_tpu.ops.pallas.gsr_centered import (_DOT, _interpret,
                                                         _tile_quantities)


def _rk4_kernel(dt_ref, x_ref, muT_ref, ppT_ref, v_ref, phi_ref, vj_ref,
                p_s, v0_s, v1_s, v2_s, acc_s, *, d, vdim, clamp, nj, njac):
    s, j = pl.program_id(1), pl.program_id(2)
    dt = dt_ref[0, 0]

    @pl.when((s == 0) & (j == 0))
    def _():
        p_s[:] = x_ref[:]

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    v = v_ref[:]
    _, g, m, pd = _tile_quantities(p_s[:], muT_ref[:], ppT_ref[:], d, clamp)
    mgv = jnp.where(m, g - clamp, 0.0)
    acc_s[:, :vdim] += _DOT(mgv, v, (((1,), (0,)), ((), ())))

    @pl.when(s == 4)
    def _():
        mg = jnp.where(m, g, 0.0)
        for k in range(njac):
            acc_s[:, (1 + k) * vdim:(2 + k) * vdim] += _DOT(
                -mg * pd[k], v, (((1,), (0,)), ((), ())))

    @pl.when(j == nj - 1)
    def _():
        x0 = x_ref[:]
        vel = acc_s[:, :d]

        @pl.when(s == 0)
        def _():
            v0_s[:] = vel
            p_s[:] = x0 + 0.5 * dt * vel

        @pl.when(s == 1)
        def _():
            v1_s[:] = vel
            p_s[:] = x0 + 0.5 * dt * vel

        @pl.when(s == 2)
        def _():
            v2_s[:] = vel
            p_s[:] = x0 + dt * vel

        @pl.when(s == 3)
        def _():
            phi = x0 + dt / 6.0 * (v0_s[:] + 2.0 * v1_s[:]
                                   + 2.0 * v2_s[:] + vel)
            p_s[:] = phi
            phi_ref[:] = phi

        @pl.when(s == 4)
        def _():
            vj_ref[:] = acc_s[:]


def fused_rk4(x, muT, ppT, values, dt, d, clamp, tb, tn, njac):
    """(phi (B, d), valjac (B, (1+njac)*d)): RK4 endpoint through the
    velocity field defined by (muT, ppT, values) and the (value, jac)
    columns evaluated AT the endpoint. ``njac=0`` -> valjac carries only
    the endpoint velocity. dt may be negative (backtrace)."""
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    vdim = values.shape[1]
    assert vdim == d, "RK4 advection needs a velocity field (vdim == d)"
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    cols = (1 + njac) * vdim
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_rk4_kernel, d=d, vdim=vdim, clamp=clamp,
                          nj=N // tn, njac=njac),
        grid=(B // tb, 5, N // tn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda i, s, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda i, s, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, d), lambda i, s, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda i, s, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, cols), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, d), jnp.float32),      # current stage position
            pltpu.VMEM((tb, d), jnp.float32),      # v0
            pltpu.VMEM((tb, d), jnp.float32),      # v1
            pltpu.VMEM((tb, d), jnp.float32),      # v2
            pltpu.VMEM((tb, cols), jnp.float32),   # stage accumulator
        ],
        interpret=_interpret(),
    )(dt_arr, x, muT, ppT, values)
