"""Centered fused Pallas TPU kernel for Gaussian field value + Jacobian.

Replaces the round-1 polynomial-feature kernel (deleted in round 2) on the
hot path. Two
structural fixes make it both faster and numerically safe at bf16 MXU
precision (DEFAULT):

1. The quadratic form is computed CENTERED on the VPU in f32:
       delta = x - mu;  Pd_k = sum_j P_kj delta_j;
       quad = sum_k delta_k Pd_k  (+ dead bias)
   The expanded form (x^T P x - 2 x . P mu + mu^T P mu, a K~10 matmul) has
   O(1e3) terms cancelling to O(1) — it needs full-f32 MXU passes AND pads
   K=10 to the 128-wide MXU, wasting 12x. The centered form has O(1)
   operands, no cancellation, and no matmul at all; Pd is reused for both
   quad and the Jacobian.

2. The Jacobian is contracted DIRECTLY:
       jac[b,a,k] = -sum_n mg[b,n] * Pd[b,n,k] * v[n,a]
   as d thin (B,N)@(N,vdim) matmuls with well-conditioned weights
   w_k = mg * Pd_k (|w_k| <= e^{-1/2} sqrt(lambda_max)). The old kernel's
   t1 @ x - t2 finish amplified bf16 rounding ~50x (|t1.x| >> |jac|),
   forcing full-f32 MXU there.

Measured vs float64 at N=64k on a v5e chip this kernel is 5x more accurate
than the dense XLA path (6.9e-3 vs 3.5e-2 max jac error) and faster than
the all-HIGHEST feature kernel (see scripts/bench_backends.py).

Layout note: per-Gaussian per-dimension rows (mu, packed P) are passed
TRANSPOSED — (d, N) / (np, N) — so a dimension's row lands in the kernel as
a (1, TN) lane vector and broadcasts against (TB, 1) query columns without
any in-kernel relayout.

The custom VJP recomputes delta/g/Pd tile-locally in two backward passes
(flash-attention-style): one gridded B x N for dx, one N x B for
(dmu, dPp, dvalues). No (B, N) tensor ever touches HBM.

Packing: ppT ((d*(d+1)/2 + 1), N) carries the upper triangle of the
symmetric precision P — diagonal first, then off-diagonals in (0,1), (0,2),
(1,2) order — plus a bias row (+1e9 marks dead/out-of-domain/padding rows
so g underflows to exactly 0).

Reference parity: this computes the reference's fast-path field semantics
(value with clamp subtraction, reference 2D/GSR.py:279-281; analytic
Jacobian 2D/GSR.py:527-547, 3D/GSR.py:599-632) — the hand-derived Taichi
backward kernels (2D/GSR.py:284-476) are replaced by this VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT = functools.partial(jax.lax.dot_general,
                         preferred_element_type=jnp.float32)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _off_pairs(d: int):
    return [(i, j) for i in range(d) for j in range(i + 1, d)]


def _mm_fwd(w, v, dims):
    """Forward-kernel (TB, TN) @ (TN, vdim) contraction.

    MEASURED NEGATIVE (round 5, scripts/bench_fwd_bf16.py on the pinned
    production checkpoint): explicitly casting these operands to bf16
    (GF_FWD_MM_BF16=1) produced BIT-IDENTICAL outputs and a 1.00x epoch
    rate — because ``lax.dot_general`` at the DEFAULT precision already
    issues f32 operands as a single bf16 MXU pass on TPU. The thin
    vdim-padded matmuls were never running in the 6-pass f32 mode, so
    there is no precision left to trade for speed here; the forward
    sweeps' cost is VPU elementwise + exp + work-list prep, not MXU
    passes. Kept as the documented finding; the helper now just issues
    the dot."""
    return _DOT(w, v, dims)


def _tile_quantities(x, muT, ppT, d, clamp):
    """delta list, g, m, Pd list — all (TB, TN), f32 on the VPU.

    x: (TB, d); muT: (d, TN); ppT: (np, TN).
    """
    delta = [x[:, i:i + 1] - muT[i:i + 1, :] for i in range(d)]
    pairs = _off_pairs(d)
    pd = []
    for k in range(d):
        acc = ppT[k:k + 1, :] * delta[k]
        for c, (i, j) in enumerate(pairs):
            if i == k:
                acc += ppT[d + c:d + c + 1, :] * delta[j]
            elif j == k:
                acc += ppT[d + c:d + c + 1, :] * delta[i]
        pd.append(acc)
    nb = d * (d + 1) // 2
    quad = ppT[nb:nb + 1, :] + delta[0] * pd[0]
    for k in range(1, d):
        quad += delta[k] * pd[k]
    g = jnp.exp(-0.5 * quad)
    m = g >= clamp
    return delta, g, m, pd


def _fwd_kernel(tmask_ref, x_ref, muT_ref, ppT_ref, v_ref, out_ref, acc_ref,
                *, d, vdim, clamp, nsteps, njac):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(tmask_ref[i, j] != 0)
    def _():
        _, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT_ref[:], d,
                                       clamp)
        v = v_ref[:]
        mgv = jnp.where(m, g - clamp, 0.0)
        mg = jnp.where(m, g, 0.0)
        acc_ref[:, :vdim] += _mm_fwd(mgv, v, (((1,), (0,)), ((), ())))
        for k in range(njac):
            acc_ref[:, (1 + k) * vdim:(2 + k) * vdim] += _mm_fwd(
                -mg * pd[k], v, (((1,), (0,)), ((), ())))

    @pl.when(j == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_cotangents(g, m, pd, dout, v, njac, vdim, use_val=True):
    """Shared: (gquad, gpd list, mg) from output cotangents.

    ``use_val=False`` promises the value cotangent ``dout[:, :vdim]`` is
    identically zero (jac-only heads, e.g. 2D vorticity/divergence) and
    skips its matmul."""
    # s1 = dval @ v^T ; s2k = djac_k @ v^T    -- (TB, TN)
    s2 = [_DOT(dout[:, (1 + k) * vdim:(2 + k) * vdim], v,
               (((1,), (1,)), ((), ()))) for k in range(njac)]
    mg = jnp.where(m, g, 0.0)
    if use_val:
        gg = _DOT(dout[:, :vdim], v, (((1,), (1,)), ((), ())))
        for k in range(njac):
            gg = gg - s2[k] * pd[k]
    else:
        gg = -s2[0] * pd[0]
        for k in range(1, njac):
            gg = gg - s2[k] * pd[k]
    gquad = jnp.where(m, -0.5 * g * gg, 0.0)    # dL/dquad
    gpd = [-mg * s2[k] for k in range(njac)]    # dL/dPd_k
    return gquad, gpd, mg


def _dxj_tile(gquad, gpd, pd, ppT, d, jdim):
    """dL/dx_j contributions on the (TB, TN) tile (before reduction):
    dquad/dx_j = 2 Pd_j ; dPd_k/dx_j = P[k, j]. ``gpd`` may be shorter
    than d (value-only mode has no Pd cotangents)."""
    t = gquad * (2.0 * pd[jdim])
    if jdim < len(gpd):
        t += gpd[jdim] * ppT[jdim:jdim + 1, :]
    for c, (i, jj) in enumerate(_off_pairs(d)):
        if i == jdim and jj < len(gpd):
            t += gpd[jj] * ppT[d + c:d + c + 1, :]
        elif jj == jdim and i < len(gpd):
            t += gpd[i] * ppT[d + c:d + c + 1, :]
    return t


def _bwd_dx_kernel(tmask_ref, x_ref, muT_ref, ppT_ref, v_ref, dout_ref,
                   dx_ref, acc_ref, *, d, vdim, clamp, nsteps, njac):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(tmask_ref[i, j] != 0)
    def _():
        ppT = ppT_ref[:]
        _, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d, clamp)
        gquad, gpd, _ = _bwd_cotangents(g, m, pd, dout_ref[:], v_ref[:],
                                        njac, vdim)
        for jdim in range(d):
            t = _dxj_tile(gquad, gpd, pd, ppT, d, jdim)
            acc_ref[:, jdim:jdim + 1] += jnp.sum(t, axis=1, keepdims=True)

    @pl.when(j == nsteps - 1)
    def _():
        dx_ref[:] = acc_ref[:]


def _row_sum(t):
    """(1, TN) <- sum over sublanes of a (TB, TN) plane.

    GF_DN_MXU_REDUCE=1 maps it to a ones-vector matmul: the dn sweeps do
    10 of these per cotangent per grid step (20 in the dual kernel) and
    the VPU is the binding unit (BASELINE.md roofline) — a (1, TB) @
    (TB, TN) contraction moves the whole reduction onto the idle MXU.
    Off by default until the on-chip A/B lands."""
    import os
    if os.environ.get("GF_DN_MXU_REDUCE", "0") == "1":
        ones = jnp.ones((1, t.shape[0]), jnp.float32)
        return _DOT(ones, t, (((1,), (0,)), ((), ())))
    return jnp.sum(t, axis=0, keepdims=True)


def _dn_accumulate(delta, g, m, pd, ppT, dout, v, d, vdim, clamp, njac,
                   dmp_acc, dv_acc, use_val=True):
    """Accumulate (dmu, dPp, dv) for one cotangent block into the scratch
    accumulators, given the shared tile quantities. ``use_val=False``
    promises a zero value cotangent (jac-only heads) and skips its
    matmuls.

    ``dmp_acc`` is a single PACKED (d + np, TN) row accumulator — rows
    0..d-1 are dmu (transposed), rows d.. are dPp (transposed, bias row
    last). Every per-Gaussian reduction is a sublane sum landing as a
    (1, TN) lane vector added to its row in place; the previous per-column
    (TN, 1) layout forced a lane->sublane relayout per quantity per grid
    step (6 in 2D, 10 in 3D — doubled in the dual kernel), which measured
    ~25% of the backward sweep."""
    gquad, gpd, mg = _bwd_cotangents(g, m, pd, dout, v, njac, vdim,
                                     use_val)

    # dv: mgv^T @ dval - sum_k (mg Pd_k)^T @ djac_k
    if use_val:
        mgv = jnp.where(m, g - clamp, 0.0)
        dv = _DOT(mgv, dout[:, :vdim], (((0,), (0,)), ((), ())))
    else:
        dv = _DOT(-mg * pd[0], dout[:, vdim:2 * vdim],
                  (((0,), (0,)), ((), ())))
    for k in range(0 if use_val else 1, njac):
        dv += _DOT(-mg * pd[k],
                   dout[:, (1 + k) * vdim:(2 + k) * vdim],
                   (((0,), (0,)), ((), ())))
    dv_acc[:] += dv

    # dmu_j = -(dL/dx_j summed over the tile's queries), per n
    for jdim in range(d):
        t = _dxj_tile(gquad, gpd, pd, ppT, d, jdim)
        dmp_acc[jdim:jdim + 1, :] += -_row_sum(t)

    # dPp: diagonal d(quad)/dP_ii = delta_i^2, d(Pd_i)/dP_ii = delta_i;
    # off-diag (i<j): d(quad)/dP_ij = 2 delta_i delta_j,
    # d(Pd_i)/dP_ij = delta_j, d(Pd_j)/dP_ij = delta_i; bias: d(quad)=1.
    for k in range(d):
        t = gquad * delta[k] * delta[k]
        if k < njac:
            t += gpd[k] * delta[k]
        dmp_acc[d + k:d + k + 1, :] += _row_sum(t)
    for c, (ii, jj) in enumerate(_off_pairs(d)):
        t = 2.0 * gquad * delta[ii] * delta[jj]
        if ii < njac:
            t += gpd[ii] * delta[jj]
        if jj < njac:
            t += gpd[jj] * delta[ii]
        dmp_acc[2 * d + c:2 * d + c + 1, :] += _row_sum(t)
    nb = d * (d + 1) // 2
    dmp_acc[d + nb:d + nb + 1, :] += _row_sum(gquad)


def _bwd_dn_kernel(tmask_ref, x_ref, muT_ref, ppT_ref, v_ref, dout_ref,
                   dmp_ref, dv_ref, dmp_acc, dv_acc, *,
                   d, vdim, clamp, nsteps, njac):
    jn, i = pl.program_id(0), pl.program_id(1)  # B is the reduction axis

    @pl.when(i == 0)
    def _():
        dmp_acc[:] = jnp.zeros_like(dmp_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(tmask_ref[i, jn] != 0)
    def _():
        ppT = ppT_ref[:]
        delta, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d,
                                           clamp)
        _dn_accumulate(delta, g, m, pd, ppT, dout_ref[:], v_ref[:], d, vdim,
                       clamp, njac, dmp_acc, dv_acc)

    @pl.when(i == nsteps - 1)
    def _():
        dmp_ref[:] = dmp_acc[:]
        dv_ref[:] = dv_acc[:]


def _bwd_dn2_kernel(tmask_ref, x_ref, muT_ref, ppT_ref, v_ref, dout1_ref,
                    dout2_ref, dmp1_ref, dv1_ref, dmp2_ref, dv2_ref,
                    dmp1_acc, dv1_acc, dmp2_acc, dv2_acc, *, d, vdim,
                    clamp, nsteps, njac, use_val):
    """Dual-cotangent (dmu, dPp, dv) backward: the PCGrad projection needs
    the vorticity-head and divergence-head parameter gradients SEPARATELY
    (reference 2D/advance.py:188-193); two jax.vjp pullbacks would recompute
    delta/g/Pd tile quantities twice. This kernel shares one recompute
    between both cotangent blocks."""
    jn, i = pl.program_id(0), pl.program_id(1)  # B is the reduction axis

    @pl.when(i == 0)
    def _():
        for acc in (dmp1_acc, dv1_acc, dmp2_acc, dv2_acc):
            acc[:] = jnp.zeros_like(acc)

    @pl.when(tmask_ref[i, jn] != 0)
    def _():
        ppT = ppT_ref[:]
        delta, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d,
                                           clamp)
        v = v_ref[:]
        _dn_accumulate(delta, g, m, pd, ppT, dout1_ref[:], v, d, vdim,
                       clamp, njac, dmp1_acc, dv1_acc, use_val)
        _dn_accumulate(delta, g, m, pd, ppT, dout2_ref[:], v, d, vdim,
                       clamp, njac, dmp2_acc, dv2_acc, use_val)

    @pl.when(i == nsteps - 1)
    def _():
        dmp1_ref[:] = dmp1_acc[:]
        dv1_ref[:] = dv1_acc[:]
        dmp2_ref[:] = dmp2_acc[:]
        dv2_ref[:] = dv2_acc[:]


def _bwd_dn3_kernel(tmask_ref, x_ref, muT_ref, ppT_ref, v_ref, dout1_ref,
                    dout2_ref, dout3_ref, dmp1_ref, dv1_ref, dmp2_ref,
                    dv2_ref, dmp3_ref, dv3_ref, dmp1_acc, dv1_acc,
                    dmp2_acc, dv2_acc, dmp3_acc, dv3_acc, *, d,
                    vdim, clamp, nsteps, njac, use_val12, data_tiles):
    """Triple-cotangent backward for the fused projection epoch: blocks 1/2
    are the PCGrad heads' (val, jac) cotangents on the DATA rows (the first
    ``data_tiles`` B-tiles), block 3 is a value-only cotangent on the
    BOUNDARY rows (the remaining tiles). One tile-quantity recompute per
    B-tile serves whichever blocks are live there: data tiles run the two
    jac accumulations, boundary tiles only the cheap value accumulation."""
    jn, i = pl.program_id(0), pl.program_id(1)  # B is the reduction axis

    @pl.when(i == 0)
    def _():
        for acc in (dmp1_acc, dv1_acc, dmp2_acc, dv2_acc, dmp3_acc,
                    dv3_acc):
            acc[:] = jnp.zeros_like(acc)

    @pl.when(tmask_ref[i, jn] != 0)
    def _():
        ppT = ppT_ref[:]
        delta, g, m, pd = _tile_quantities(x_ref[:], muT_ref[:], ppT, d,
                                           clamp)
        v = v_ref[:]

        @pl.when(i < data_tiles)
        def _():
            _dn_accumulate(delta, g, m, pd, ppT, dout1_ref[:], v, d, vdim,
                           clamp, njac, dmp1_acc, dv1_acc, use_val12)
            _dn_accumulate(delta, g, m, pd, ppT, dout2_ref[:], v, d, vdim,
                           clamp, njac, dmp2_acc, dv2_acc, use_val12)

        @pl.when(i >= data_tiles)
        def _():
            _dn_accumulate(delta, g, m, pd, ppT, dout3_ref[:], v, d, vdim,
                           clamp, 0, dmp3_acc, dv3_acc, True)

    @pl.when(i == nsteps - 1)
    def _():
        for ref, acc in ((dmp1_ref, dmp1_acc), (dv1_ref, dv1_acc),
                         (dmp2_ref, dmp2_acc), (dv2_ref, dv2_acc),
                         (dmp3_ref, dmp3_acc), (dv3_ref, dv3_acc)):
            ref[:] = acc[:]


def fused_gsr_centered_bwd3(tmask, x, muT, ppT, values, dout1, dout2,
                            dout3, d, vdim, clamp, tb, tn, data_rows,
                            njac=-1, use_val12=False):
    """Parameter cotangents for the fused [data; boundary] epoch geometry:
    ((dmuT1, dppT1, dv1), (dmuT2, dppT2, dv2), (dmuT3, dppT3, dv3)) in ONE
    B-sweep. ``x`` is the concatenation of data rows (cotangent blocks 1/2,
    (val, jac) columns, zero outside the data rows) and boundary rows
    (block 3, value-only cotangent, zero outside the boundary rows);
    ``data_rows`` must be a multiple of tb. dmuT/dppT come back TRANSPOSED
    — (d, N) / (np, N), matching the kernel's input layout — from a packed
    row accumulator (see _dn_accumulate); dv is (N, vdim)."""
    njac = d if njac < 0 else njac
    assert use_val12 or njac >= 1
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    nmp = d + np_
    cols = (1 + njac) * vdim
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    assert tmask.shape == (B // tb, N // tn), (tmask.shape, B // tb, N // tn)
    # data_rows > B would make the boundary branch unreachable and return
    # silently-zero boundary cotangents
    assert 0 <= data_rows <= B and data_rows % tb == 0, (data_rows, B, tb)
    assert dout1.shape == (B, cols) and dout2.shape == (B, cols), (
        dout1.shape, dout2.shape, B, cols)
    assert dout3.shape == (B, vdim), (dout3.shape, B, vdim)
    dmp_spec = pl.BlockSpec((nmp, tn), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    dv_spec = pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_dn3_kernel, d=d, vdim=vdim, clamp=clamp,
                          nsteps=B // tb, njac=njac, use_val12=use_val12,
                          data_tiles=data_rows // tb),
        grid=(N // tn, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, vdim), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(dmp_spec, dv_spec) * 3,
        out_shape=(jax.ShapeDtypeStruct((nmp, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, vdim), jnp.float32)) * 3,
        scratch_shapes=[pltpu.VMEM((nmp, tn), jnp.float32),
                        pltpu.VMEM((tn, vdim), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(tmask, x, muT, ppT, values, dout1, dout2, dout3)
    return tuple((out[2 * b][:d], out[2 * b][d:], out[2 * b + 1])
                 for b in range(3))


def _fwd(tmask, x, muT, ppT, values, d, vdim, clamp, tb, tn, njac):
    B = x.shape[0]
    N = muT.shape[1]
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    nsteps = N // tn
    assert tmask.shape == (B // tb, nsteps), (tmask.shape, B // tb, nsteps)
    cols = (1 + njac) * vdim
    np_ = ppT.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, vdim=vdim, clamp=clamp,
                          nsteps=nsteps, njac=njac),
        grid=(B // tb, nsteps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, cols), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, cols), jnp.float32)],
        interpret=_interpret(),
    )(tmask, x, muT, ppT, values)


def _bwd(tmask, x, muT, ppT, values, dout, d, vdim, clamp, tb, tn, njac,
         need_dx=True):
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    cols = (1 + njac) * vdim
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    assert tmask.shape == (B // tb, N // tn), (tmask.shape, B // tb, N // tn)
    dx = None if not need_dx else pl.pallas_call(
        functools.partial(_bwd_dx_kernel, d=d, vdim=vdim, clamp=clamp,
                          nsteps=N // tn, njac=njac),
        grid=(B // tb, N // tn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, d), jnp.float32)],
        interpret=_interpret(),
    )(tmask, x, muT, ppT, values, dout)

    dmp, dv = pl.pallas_call(
        functools.partial(_bwd_dn_kernel, d=d, vdim=vdim, clamp=clamp,
                          nsteps=B // tb, njac=njac),
        grid=(N // tn, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d + np_, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((d + np_, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, vdim), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((d + np_, tn), jnp.float32),
                        pltpu.VMEM((tn, vdim), jnp.float32)],
        # same raised scoped-vmem budget as the dual kernel (see
        # fused_gsr_centered_bwd2): the single-cotangent working set is
        # ~half the dual's but can still brush the 16 MB default at large
        # tb; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(tmask, x, muT, ppT, values, dout)
    if dx is None:
        dx = jnp.zeros_like(x)
    return dx, dmp[:d], dmp[d:], dv


def fused_gsr_centered_bwd2(tmask, x, muT, ppT, values, dout1, dout2,
                            d, vdim, clamp, tb, tn, njac=-1,
                            use_val=True):
    """Parameter cotangents for TWO output cotangent blocks in ONE B-sweep
    (shared tile recompute). Returns ((dmuT1, dppT1, dv1), (dmuT2, dppT2,
    dv2)) with dmuT (d, N), dppT (np, N) TRANSPOSED — already in the
    kernel-input layout the prep VJP consumes — and dv (N, vdim). No dx
    (training epochs treat x as a constant of the loss)."""
    njac = d if njac < 0 else njac
    assert use_val or njac >= 1
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    nmp = d + np_
    cols = (1 + njac) * vdim
    assert B % tb == 0 and N % tn == 0, (B, N, tb, tn)
    assert tmask.shape == (B // tb, N // tn), (tmask.shape, B // tb, N // tn)
    assert dout1.shape == (B, cols) and dout2.shape == (B, cols), (
        dout1.shape, dout2.shape, B, cols)
    dmp_spec = pl.BlockSpec((nmp, tn), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    dv_spec = pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_dn2_kernel, d=d, vdim=vdim, clamp=clamp,
                          nsteps=B // tb, njac=njac, use_val=use_val),
        grid=(N // tn, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, vdim), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cols), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(dmp_spec, dv_spec) * 2,
        out_shape=(jax.ShapeDtypeStruct((nmp, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, vdim), jnp.float32)) * 2,
        scratch_shapes=[pltpu.VMEM((nmp, tn), jnp.float32),
                        pltpu.VMEM((tn, vdim), jnp.float32)] * 2,
        # the dual kernel's working set sits just over the 16 MB default
        # scoped-vmem budget at 3D production scale (N=64k, B=8192:
        # 17.4 MB); the chip has 128 MB — raise the compiler budget rather
        # than shrink the tiles
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=_interpret(),
    )(tmask, x, muT, ppT, values, dout1, dout2)
    return ((out[0][:d], out[0][d:], out[1]),
            (out[2][:d], out[2][d:], out[3]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_gsr_centered(tmask, x, muT, ppT, values, d, vdim, clamp,
                       tb=256, tn=512, njac=-1, need_dx=True):
    """(B, (1+d)*vdim) = [val | jac_0 | ... | jac_{d-1}] columns, where
    jac_k[:, a] = d u_a / d x_k (sign included). ``tmask``
    (B//tb, N//tn) i32 marks (query-tile, gaussian-tile) pairs that may
    interact; 0-tiles are skipped entirely (the caller must guarantee
    skipped tiles cannot contribute — see field.value_and_jac_centered).
    ``njac``: how many Jacobian column groups to emit (d, or 0 for
    value-only; -1 means d). ``need_dx=False`` (static) skips the entire
    dL/dx backward pass and returns a zero cotangent for x — use when the
    query points are constants of the loss (every training epoch), saving
    one of the two B x N backward sweeps."""
    njac = d if njac < 0 else njac
    return _fwd(tmask, x, muT, ppT, values, d, vdim, clamp, tb, tn, njac)


def _fwd_rule(tmask, x, muT, ppT, values, d, vdim, clamp, tb, tn, njac=-1,
              need_dx=True):
    njac = d if njac < 0 else njac
    return _fwd(tmask, x, muT, ppT, values, d, vdim, clamp, tb, tn,
                njac), (tmask, x, muT, ppT, values)


def _bwd_rule(d, vdim, clamp, tb, tn, njac, need_dx, res, dout):
    njac = d if njac < 0 else njac
    tmask, x, muT, ppT, values = res
    dx, dmuT, dppT, dv = _bwd(tmask, x, muT, ppT, values, dout, d, vdim,
                              clamp, tb, tn, njac, need_dx)
    return jnp.zeros_like(tmask), dx, dmuT, dppT, dv


fused_gsr_centered.defvjp(_fwd_rule, _bwd_rule)


# ---- banded value-only forward (density / huge query sets) ----
#
# For very large, spatially coherent query sets (the 512^3 semi-Lagrangian
# backtrace, reference 3D/advance_density.py:52-59) even SKIPPED grid steps
# of the masked kernel dominate (B/tb * N/tn steps). With both queries and
# Gaussians coordinate-sorted the interacting tiles form a contiguous band
# in j; this variant walks only a per-query-tile window of `band` N-tiles,
# whose start jlo[i] is scalar-prefetched into the index maps. Forward-only
# (no VJP) — the density replay takes no gradients. The caller must
# guarantee every interacting N-tile lies in [jlo[i], jlo[i]+band) — see
# field.value_banded.


def _val_tile(x, muT, ppT, d, clamp):
    """(mgv,) value-only tile quantities: quad computed directly (no Pd)."""
    delta = [x[:, i:i + 1] - muT[i:i + 1, :] for i in range(d)]
    nb = d * (d + 1) // 2
    quad = ppT[nb:nb + 1, :] + ppT[0:1, :] * delta[0] * delta[0]
    for i in range(1, d):
        quad += ppT[i:i + 1, :] * delta[i] * delta[i]
    for c, (i, j) in enumerate(_off_pairs(d)):
        quad += (2.0 * ppT[d + c:d + c + 1, :]) * delta[i] * delta[j]
    g = jnp.exp(-0.5 * quad)
    return jnp.where(g >= clamp, g - clamp, 0.0)


def _val_banded_kernel(jlo_ref, x_ref, muT_ref, ppT_ref, v_ref, out_ref,
                       acc_ref, *, d, clamp, band):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mgv = _val_tile(x_ref[:], muT_ref[:], ppT_ref[:], d, clamp)
    acc_ref[:] += _DOT(mgv, v_ref[:], (((1,), (0,)), ((), ())))

    @pl.when(j == band - 1)
    def _():
        out_ref[:] = acc_ref[:]


def fused_gsr_value_banded(jlo, x, muT, ppT, values, d, vdim, clamp,
                           tb, tn, band):
    """out (B, vdim) = field value; jlo (B//tb,) i32 window starts.
    The index maps clamp the window start into [0, N//tn - band], so a
    caller-supplied jlo can never index blocks past the arrays (the
    documented contract in field.value_banded, made unbreakable here)."""
    B = x.shape[0]
    N = muT.shape[1]
    np_ = ppT.shape[0]
    assert B % tb == 0 and N % tn == 0 and band <= N // tn
    assert jlo.shape == (B // tb,), (jlo.shape, B // tb)
    jmax = N // tn - band

    def _jl(jlo, i):
        return jnp.clip(jlo[i], 0, jmax)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // tb, band),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j, jlo: (i, 0)),
            pl.BlockSpec((d, tn), lambda i, j, jlo: (0, _jl(jlo, i) + j)),
            pl.BlockSpec((np_, tn),
                         lambda i, j, jlo: (0, _jl(jlo, i) + j)),
            pl.BlockSpec((tn, vdim),
                         lambda i, j, jlo: (_jl(jlo, i) + j, 0)),
        ],
        out_specs=pl.BlockSpec((tb, vdim), lambda i, j, jlo: (i, 0)),
        scratch_shapes=[pltpu.VMEM((tb, vdim), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_val_banded_kernel, d=d, clamp=clamp, band=band),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, vdim), jnp.float32),
        interpret=_interpret(),
    )(jlo, x, muT, ppT, values)
