"""Fused Pallas TPU kernel for the Gaussian field evaluation.

The dense XLA path (ops/field.py) materialises the (B, N) masked kernel
matrix in HBM between the quad-form matmul and the value/Jacobian
contractions — at production scale that is ~GBs of traffic per call and is
the measured bottleneck. This kernel fuses the chain

    quad = feat @ W^T  ->  g = exp(-.5 quad)  ->  compact-support mask  ->
    out  = [(g - c)*m @ rhs_val | g*m @ rhs_grad]

into one pass over (B-tile, N-tile) blocks: the kernel matrix lives only in
VMEM, HBM sees just the inputs and the small (B, C) outputs. The rhs packs
[V | v (x) P | v (x) P mu]; the Jacobian is finished outside with one tiny
contraction against x (see ops/field.py for the algebra).

The custom VJP recomputes g tile-locally in two backward passes
(flash-attention-style rematerialisation): one gridded B x N for d feat,
one gridded N x B for (dW, d rhs). No (B, N) tensor ever touches HBM.

Out-of-domain / dead Gaussians are folded into W by adding a huge constant
to their quad-form bias: g underflows to exactly 0 and the mask kills them
— no separate mask input (see ops/field.py pallas wiring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Precision (Mosaic supports only DEFAULT = 1x bf16 pass and HIGHEST =
# full f32). Everything here runs HIGHEST:
#   * the quad-form matmul's terms are O(mu^T Sigma^{-1} mu) ~ 1e3 and
#     cancel down to O(1); one bf16 pass leaves +-10 absolute error, the
#     difference goes negative, and exp(-quad/2) explodes;
#   * the Jacobian contraction t1 = mg @ (v x P) feeds the outer
#     t1.x - t2 cancellation (|t1.x| ~ 50x |jac|), so bf16 rounding there
#     costs ~10% of the Jacobian (measured 0.23 abs vs float64 at N=64k —
#     unusable for divergence residuals).
# Measured vs float64 at N=64k, all-HIGHEST: 1.6e-4 max jac error — 200x
# more accurate than the dense XLA path (3.5e-2) at the same speed.
_QUAD_DOT = functools.partial(jax.lax.dot_general,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
_DOT = _QUAD_DOT


def _interpret() -> bool:
    # run in interpreter mode off-TPU (CPU tests / debugging)
    return jax.default_backend() not in ("tpu", "axon")


def _masked_g(feat, w, clamp):
    quad = _QUAD_DOT(feat, w, (((1,), (1,)), ((), ())))   # (TB, TN)
    g = jnp.exp(-0.5 * quad)
    m = g >= clamp
    return g, m


def _fwd_kernel(feat_ref, w_ref, rhs_ref, out_ref, acc_ref, *, clamp, nv,
                nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g, m = _masked_g(feat_ref[:], w_ref[:], clamp)
    mg = jnp.where(m, g, 0.0)
    mgv = jnp.where(m, g - clamp, 0.0)
    rhs = rhs_ref[:]
    acc_ref[:, :nv] += _DOT(mgv, rhs[:, :nv], (((1,), (0,)), ((), ())))
    acc_ref[:, nv:] += _DOT(mg, rhs[:, nv:], (((1,), (0,)), ((), ())))

    @pl.when(j == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def fused_forward(feat: jnp.ndarray, W: jnp.ndarray, rhs: jnp.ndarray,
                  n_val_cols: int, clamp: float,
                  tb: int = 256, tn: int = 512) -> jnp.ndarray:
    """out[b] = mgv(b, :) @ rhs[:, :nv] ++ mg(b, :) @ rhs[:, nv:].
    feat (B, F), W (N, F), rhs (N, C) -> (B, C); B % tb == N % tn == 0."""
    B, F = feat.shape
    N, C = rhs.shape
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    nsteps = N // tn
    return pl.pallas_call(
        functools.partial(_fwd_kernel, clamp=clamp, nv=n_val_cols,
                          nsteps=nsteps),
        grid=(B // tb, nsteps),
        in_specs=[
            pl.BlockSpec((tb, F), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, F), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, C), jnp.float32)],
        interpret=_interpret(),
    )(feat, W, rhs)


def _dg_from_dout(dout, rhs, nv):
    return (_DOT(dout[:, :nv], rhs[:, :nv], (((1,), (1,)), ((), ())))
            + _DOT(dout[:, nv:], rhs[:, nv:], (((1,), (1,)), ((), ()))))


def _bwd_dfeat_kernel(feat_ref, w_ref, rhs_ref, dout_ref, dfeat_ref,
                      acc_ref, *, clamp, nv, nsteps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g, m = _masked_g(feat_ref[:], w_ref[:], clamp)
    dg = _dg_from_dout(dout_ref[:], rhs_ref[:], nv)
    dquad = jnp.where(m, -0.5 * g * dg, 0.0)
    acc_ref[:] += _DOT(dquad, w_ref[:], (((1,), (0,)), ((), ())))

    @pl.when(j == nsteps - 1)
    def _():
        dfeat_ref[:] = acc_ref[:]


def _bwd_dwrhs_kernel(feat_ref, w_ref, rhs_ref, dout_ref, dw_ref, drhs_ref,
                      dw_acc, drhs_acc, *, clamp, nv, nsteps):
    i = pl.program_id(1)  # B is the reduction (fast) axis in this pass

    @pl.when(i == 0)
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        drhs_acc[:] = jnp.zeros_like(drhs_acc)

    g, m = _masked_g(feat_ref[:], w_ref[:], clamp)
    mg = jnp.where(m, g, 0.0)
    mgv = jnp.where(m, g - clamp, 0.0)
    dout = dout_ref[:]
    drhs_acc[:, :nv] += _DOT(mgv, dout[:, :nv], (((0,), (0,)), ((), ())))
    drhs_acc[:, nv:] += _DOT(mg, dout[:, nv:], (((0,), (0,)), ((), ())))
    dg = _dg_from_dout(dout, rhs_ref[:], nv)
    dquad = jnp.where(m, -0.5 * g * dg, 0.0)
    dw_acc[:] += _DOT(dquad, feat_ref[:], (((0,), (0,)), ((), ())))

    @pl.when(i == nsteps - 1)
    def _():
        dw_ref[:] = dw_acc[:]
        drhs_ref[:] = drhs_acc[:]


def fused_backward(feat, W, rhs, n_val_cols, clamp, dout,
                   tb: int = 256, tn: int = 512):
    """Two tile-local passes: (B x N) -> dfeat; (N x B) -> (dW, drhs)."""
    B, F = feat.shape
    N, C = rhs.shape
    dfeat = pl.pallas_call(
        functools.partial(_bwd_dfeat_kernel, clamp=clamp, nv=n_val_cols,
                          nsteps=N // tn),
        grid=(B // tb, N // tn),
        in_specs=[
            pl.BlockSpec((tb, F), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, F), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, F), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, F), jnp.float32)],
        interpret=_interpret(),
    )(feat, W, rhs, dout)

    dW, drhs = pl.pallas_call(
        functools.partial(_bwd_dwrhs_kernel, clamp=clamp, nv=n_val_cols,
                          nsteps=B // tb),
        grid=(N // tn, B // tb),
        in_specs=[
            pl.BlockSpec((tb, F), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, F), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, F), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((N, F), jnp.float32),
                   jax.ShapeDtypeStruct((N, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((tn, F), jnp.float32),
                        pltpu.VMEM((tn, C), jnp.float32)],
        interpret=_interpret(),
    )(feat, W, rhs, dout)
    return dfeat, dW, drhs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_gsr_matmul(feat, W, rhs, n_val_cols, clamp, tb=256, tn=512):
    """Differentiable fused masked-Gaussian matmul (see module docstring)."""
    return fused_forward(feat, W, rhs, n_val_cols, clamp, tb, tn)


def _fwd_rule(feat, W, rhs, n_val_cols, clamp, tb, tn):
    return fused_forward(feat, W, rhs, n_val_cols, clamp, tb, tn), \
        (feat, W, rhs)


def _bwd_rule(n_val_cols, clamp, tb, tn, res, dout):
    feat, W, rhs = res
    return fused_backward(feat, W, rhs, n_val_cols, clamp, dout, tb, tn)


fused_gsr_matmul.defvjp(_fwd_rule, _bwd_rule)
