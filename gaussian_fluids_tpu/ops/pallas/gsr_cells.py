"""Work-list (cell-culled) Pallas kernels for the Gaussian field sweeps.

The centered kernels (gsr_centered.py) sweep a full (query-tile x
gaussian-tile) grid and `@pl.when`-skip masked-off pairs. That is nearly
free at coarse tiles (BASELINE.md banded-sweep experiment) but caps the
culling granularity: an x-sorted 256x512 tiling cannot get below ~0.10
mask density at 3D production scale because the tile extents + support
dilation dominate (BASELINE.md "3D-scale bound": 42-70x more pairs touched
than the reference's 27-cell walk, 3D/GSR.py:277-298).

These kernels make FINE tiles affordable: queries and Gaussians are both
Morton-sorted (ops/spatial.py) so small runs of rows are compact cubes,
the exact bbox tile mask (ops/field.py _tile_mask) is compacted into a
flat work list of live tile pairs (ops/spatial.flat_work_list), and the
kernel grid walks ONLY that list — grid size is the live-pair count, not
rows x cols. Output blocks follow the row-sorted work list (Pallas
revisiting: each output block stays VMEM-resident for its run of equal
rows, zeroed at run start, accumulated in place).

Exactness is inherited from the tile mask (every Gaussian with g >= clamp
lies within its own support radius of the query) plus the work-list
contract: `flat_work_list` visits every output block at least once, and
its overflow flag forces callers back to the full masked sweep
(lax.cond), so a too-small capacity can never drop contributions.

Shared tile math (_tile_quantities, _dn_accumulate, ...) is imported from
gsr_centered.py — same per-pair FLOPs, same f32 VPU precision story.

Reference parity: same fast-path semantics as gsr_centered.py (value with
clamp subtraction, 2D/GSR.py:279-281; analytic Jacobian 3D/GSR.py:599-632);
the culling plays the role of the reference's uniform grid + dynamic
search radius (3D/GSR.py:205-252).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_fluids_tpu.ops.pallas.gsr_centered import (
    _DOT, _dn_accumulate, _interpret, _mm_fwd, _tile_quantities)


def _is_first_of_run(ref, w):
    """True at the first work item of a run of equal rows (so the
    output block mapped from ``ref[w]`` must be zeroed)."""
    prev = ref[jnp.maximum(w - 1, 0)]
    return (w == 0) | (ref[w] != prev)


def _fwd_work_kernel(rows_ref, cols_ref, x_ref, muT_ref, ppT_ref, v_ref,
                     out_ref, *, d, vdim, clamp, njac):
    w = pl.program_id(0)

    @pl.when(_is_first_of_run(rows_ref, w))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(cols_ref[w] >= 0)
    def _():
        _, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT_ref[:], d,
                                       clamp)
        v = v_ref[:]
        mgv = jnp.where(m, g - clamp, 0.0)
        mg = jnp.where(m, g, 0.0)
        out_ref[:, :vdim] += _mm_fwd(mgv, v, (((1,), (0,)), ((), ())))
        for k in range(njac):
            out_ref[:, (1 + k) * vdim:(2 + k) * vdim] += _mm_fwd(
                -mg * pd[k], v, (((1,), (0,)), ((), ())))


def fused_gsr_cells_fwd(rows, cols, x, muT, ppT, values, d, vdim, clamp,
                        tb, tn, njac):
    """(B, (1+njac)*vdim) forward over the flat work list. ``rows`` /
    ``cols`` from ops.spatial.flat_work_list of the (B//tb, N//tn) tile
    mask; the caller owns the overflow-flag fallback."""
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    cols_out = (1 + njac) * vdim
    cap = rows.shape[0]
    assert cols.shape == (cap,)

    def _col(cols_, w):
        return jnp.maximum(cols_[w], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda w, rows_, cols_: (rows_[w], 0)),
            pl.BlockSpec((d, tn),
                         lambda w, rows_, cols_: (0, _col(cols_, w))),
            pl.BlockSpec((np_, tn),
                         lambda w, rows_, cols_: (0, _col(cols_, w))),
            pl.BlockSpec((tn, vdim),
                         lambda w, rows_, cols_: (_col(cols_, w), 0)),
        ],
        out_specs=pl.BlockSpec((tb, cols_out),
                               lambda w, rows_, cols_: (rows_[w], 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_work_kernel, d=d, vdim=vdim, clamp=clamp,
                          njac=njac),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, cols_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(rows, cols, x, muT, ppT, values)


def _dn2_work_kernel(gt_ref, qt_ref, x_ref, muT_ref, ppT_ref, v_ref,
                     dout1_ref, dout2_ref, dmp1_ref, dv1_ref, dmp2_ref,
                     dv2_ref, *, d, vdim, clamp, njac, use_val):
    w = pl.program_id(0)

    @pl.when(_is_first_of_run(gt_ref, w))
    def _():
        for ref in (dmp1_ref, dv1_ref, dmp2_ref, dv2_ref):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(qt_ref[w] >= 0)
    def _():
        ppT = ppT_ref[:]
        delta, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d,
                                           clamp)
        v = v_ref[:]
        _dn_accumulate(delta, g, m, pd, ppT, dout1_ref[:], v, d, vdim,
                       clamp, njac, dmp1_ref, dv1_ref, use_val)
        _dn_accumulate(delta, g, m, pd, ppT, dout2_ref[:], v, d, vdim,
                       clamp, njac, dmp2_ref, dv2_ref, use_val)


def _dn1_work_kernel(gt_ref, qt_ref, x_ref, muT_ref, ppT_ref, v_ref,
                     dout_ref, dmp_ref, dv_ref, *, d, vdim, clamp, njac,
                     use_val):
    w = pl.program_id(0)

    @pl.when(_is_first_of_run(gt_ref, w))
    def _():
        dmp_ref[:] = jnp.zeros_like(dmp_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    @pl.when(qt_ref[w] >= 0)
    def _():
        ppT = ppT_ref[:]
        delta, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d,
                                           clamp)
        _dn_accumulate(delta, g, m, pd, ppT, dout_ref[:], v_ref[:], d,
                       vdim, clamp, njac, dmp_ref, dv_ref, use_val)


def _dn_specs(d, np_, tb, tn, vdim, cols_in, n_cot):
    def _q(qt_, w):
        return jnp.maximum(qt_[w], 0)

    in_specs = [
        pl.BlockSpec((tb, d), lambda w, gt_, qt_: (_q(qt_, w), 0)),
        pl.BlockSpec((d, tn), lambda w, gt_, qt_: (0, gt_[w])),
        pl.BlockSpec((np_, tn), lambda w, gt_, qt_: (0, gt_[w])),
        pl.BlockSpec((tn, vdim), lambda w, gt_, qt_: (gt_[w], 0)),
    ] + [
        pl.BlockSpec((tb, cols_in), lambda w, gt_, qt_: (_q(qt_, w), 0))
    ] * n_cot
    out_specs = tuple(
        s for _ in range(n_cot) for s in (
            pl.BlockSpec((d + np_, tn), lambda w, gt_, qt_: (0, gt_[w])),
            pl.BlockSpec((tn, vdim), lambda w, gt_, qt_: (gt_[w], 0)),
        ))
    return in_specs, out_specs


def fused_gsr_cells_bwd2(gtiles, qtiles, x, muT, ppT, values, dout1, dout2,
                         d, vdim, clamp, tb, tn, njac=-1, use_val=True):
    """Dual-cotangent (dmuT, dppT, dv) x2 over the TRANSPOSED work list
    (``gtiles`` row-sorted gaussian-tile indices, ``qtiles`` the live
    query tiles or -1) — the work-list twin of
    gsr_centered.fused_gsr_centered_bwd2 (one shared tile recompute for
    the two PCGrad heads). No dx (training epochs treat x as constant)."""
    njac = d if njac < 0 else njac
    assert use_val or njac >= 1
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    nmp = d + np_
    cols_in = (1 + njac) * vdim
    cap = gtiles.shape[0]
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    assert dout1.shape == (B, cols_in) and dout2.shape == (B, cols_in)
    in_specs, out_specs = _dn_specs(d, np_, tb, tn, vdim, cols_in, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(cap,), in_specs=in_specs,
        out_specs=out_specs)
    out = pl.pallas_call(
        functools.partial(_dn2_work_kernel, d=d, vdim=vdim, clamp=clamp,
                          njac=njac, use_val=use_val),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nmp, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, vdim), jnp.float32)) * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(gtiles, qtiles, x, muT, ppT, values, dout1, dout2)
    return ((out[0][:d], out[0][d:], out[1]),
            (out[2][:d], out[2][d:], out[3]))


def fused_gsr_cells_bwd1(gtiles, qtiles, x, muT, ppT, values, dout,
                         d, vdim, clamp, tb, tn, njac=0, use_val=True):
    """Single-cotangent (dmuT, dppT, dv) over the transposed work list —
    the boundary value head's backward (njac=0: value-only columns)."""
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    nmp = d + np_
    cols_in = (1 + njac) * vdim
    cap = gtiles.shape[0]
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    assert dout.shape == (B, cols_in), (dout.shape, B, cols_in)
    in_specs, out_specs = _dn_specs(d, np_, tb, tn, vdim, cols_in, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(cap,), in_specs=in_specs,
        out_specs=out_specs)
    out = pl.pallas_call(
        functools.partial(_dn1_work_kernel, d=d, vdim=vdim, clamp=clamp,
                          njac=njac, use_val=use_val),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nmp, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, vdim), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(gtiles, qtiles, x, muT, ppT, values, dout)
    return out[0][:d], out[0][d:], out[1]
