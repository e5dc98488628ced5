"""Roofline / MFU accounting for the hot kernels (VERDICT r1 item 3) and a
defensible bound on the reference GPU solver's epoch rate (item 6).

Everything here is an *analytic model with documented arithmetic*, meant to
be multiplied by measured epoch rates — there is no profiler dependency.
FLOP counts are per (query, Gaussian) pair and were counted line-by-line
from ops/pallas/gsr_centered.py (each mul/add/select = 1 FLOP, exp = 1;
true VPU transcendental cost is higher, so stated utilizations are
conservative UPPER bounds on remaining headroom). Counts carry ~10-20%
modeling slack; treat derived utilizations as estimates, not measurements.

Chip peaks (public figures for TPU v5e / v5p):
  v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The VPU is 4-8 (8, 128) ALU
  groups at ~1.5 GHz, i.e. ~6-12 fp32 TFLOP/s (stated as a range — Google
  publishes MXU peaks, not VPU). The centered kernel's quad form runs on
  the VPU in fp32; only the (B,N)@(N,vdim) contractions hit the MXU, and
  at vdim=2..3 they are padded 128/vdim-fold, so bf16-MFU is NOT the
  binding roofline for this workload — the VPU is.
"""

from __future__ import annotations

from dataclasses import dataclass


PEAKS = {
    "v5e": {"bf16_mxu": 197e12, "fp32_vpu_lo": 6e12, "fp32_vpu_hi": 12e12,
            "hbm": 819e9},
    "v5p": {"bf16_mxu": 459e12, "fp32_vpu_lo": 14e12, "fp32_vpu_hi": 28e12,
            "hbm": 2765e9},
}


def _off(d):  # off-diagonal pair count of the packed precision
    return d * (d - 1) // 2


def tile_quantities_flops(d: int) -> int:
    """_tile_quantities: delta (d) + Pd (d*(2d-1)) + quad (2d) + exp (1) +
    clamp compare (1)."""
    return d + d * (2 * d - 1) + 2 * d + 2


def fwd_flops_per_pair(d: int, vdim: int, njac: int | None = None) -> int:
    """_fwd_kernel per (b, n) pair: tile quantities + mgv/mg selects (3) +
    value contraction (2*vdim) + njac weighted contractions (2 + 2*vdim
    each)."""
    njac = d if njac is None else njac
    return tile_quantities_flops(d) + 3 + 2 * vdim + njac * (2 + 2 * vdim)


def value_only_flops_per_pair(d: int, vdim: int) -> int:
    return fwd_flops_per_pair(d, vdim, njac=0)


def bwd_cotangent_flops(d: int, vdim: int) -> int:
    """_bwd_cotangents: s2 contractions (2*vdim*d) + gg (2*vdim + 2d) +
    gquad (3) + gpd (2d) + select (1)."""
    return 2 * vdim * d + 2 * vdim + 2 * d + 3 + 2 * d + 1


def dxj_flops(d: int) -> int:
    """_dxj_tile over all d output dims: d * (4 + 2*(d-1))."""
    return d * (2 * d + 2)


def bwd_dx_flops_per_pair(d: int, vdim: int) -> int:
    """_bwd_dx_kernel: recompute + cotangents + dx tiles + d row sums."""
    return (tile_quantities_flops(d) + bwd_cotangent_flops(d, vdim)
            + dxj_flops(d) + d)


def bwd_dn_flops_per_pair(d: int, vdim: int) -> int:
    """_bwd_dn_kernel: recompute + cotangents + dv ((1+d) contractions of
    2*vdim + 2 selects) + dmu (dx tiles + d sums) + dPp diagonal (4d) +
    off-diagonal (6 each) + bias (1)."""
    return (tile_quantities_flops(d) + bwd_cotangent_flops(d, vdim)
            + 2 + 2 * vdim * (1 + d)
            + dxj_flops(d) + d
            + 4 * d + 6 * _off(d) + 1)


# The dual-cotangent kernels (two loss heads sharing one recompute,
# two_head_grads) double the cotangent/accumulate work but share the tile
# quantities — measured structure factor vs single-cotangent:
DUAL_FACTOR = 1.8


@dataclass
class EpochCost:
    flops: float          # per epoch, tile-mask-culled pairs only
    hbm_bytes: float      # per epoch, streamed kernel traffic
    pairs: float          # culled (b, n) pairs touched per epoch

    def achieved(self, epochs_per_sec: float) -> float:
        return self.flops * epochs_per_sec

    def utilization(self, epochs_per_sec: float, chip: str = "v5e"):
        """dict of achieved-vs-peak fractions (see module docstring)."""
        f = self.achieved(epochs_per_sec)
        p = PEAKS[chip]
        return {
            "achieved_tflops": f / 1e12,
            "mfu_bf16_pct": 100 * f / p["bf16_mxu"],
            "vpu_fp32_pct_lo": 100 * f / p["fp32_vpu_hi"],
            "vpu_fp32_pct_hi": 100 * f / p["fp32_vpu_lo"],
            "hbm_gbps": self.hbm_bytes * epochs_per_sec / 1e9,
            "hbm_pct": 100 * self.hbm_bytes * epochs_per_sec / p["hbm"],
        }


def _kernel_stream_bytes(b, n, d, vdim, tb, tn, n_outputs):
    """HBM traffic of one centered pallas_call: every (i, j) grid step
    streams the x tile (tb*d), the transposed row tiles mu (d, tn), pp
    (np+1, tn), v (tn, vdim), plus the (b, n_outputs) output once.
    BlockSpec prefetch fetches masked tiles too, so no density discount."""
    npk = d * (d + 1) // 2 + 1
    steps = max(1, (b // tb)) * max(1, (n // tn))
    per_step = 4 * (tb * d + (d + npk) * tn + tn * vdim)
    return steps * per_step + 4 * b * n_outputs


def projection_epoch_cost_2d(b: int, n: int, density: float,
                             vdim: int = 2, tb: int = 256, tn: int = 512,
                             rk4_evals: int = 5) -> EpochCost:
    """The full 2D projection epoch (solver/project.py _runner_2d):
    ``rk4_evals`` val+jac forwards for the covector target (5 staged RK4
    sweeps, solver/covector.py), one shared forward + one dual-cotangent
    backward (two_head_grads: dx pass + dn pass), one value-only boundary
    forward + its dn backward, Adam/regularizers O(N) (ignored).
    ``density`` is the measured tile-mask active fraction."""
    d = 2
    pairs = density * b * n
    f_fwd = fwd_flops_per_pair(d, vdim)
    f_dual = DUAL_FACTOR * (bwd_dx_flops_per_pair(d, vdim)
                            + bwd_dn_flops_per_pair(d, vdim))
    f_bnd = value_only_flops_per_pair(d, vdim) + bwd_dn_flops_per_pair(
        d, vdim) * 0.5   # value-only dn backward (no jac cotangents)
    flops = pairs * (rk4_evals * f_fwd + f_fwd + f_dual + f_bnd)
    launches = rk4_evals + 4  # fwd + dx + dn + boundary fwd/bwd
    bytes_ = launches * _kernel_stream_bytes(b, n, d, vdim, tb, tn,
                                             (1 + d) * vdim)
    return EpochCost(flops, bytes_, pairs)


def projection_epoch_cost_3d(b: int, n: int, density: float,
                             vdim: int = 3, tb: int = 1024, tn: int = 512,
                             rk4_evals: int = 5) -> EpochCost:
    """The full 3D projection epoch (vor+hel+div heads over the fused
    forward; same structure as 2D with d=3 and a boundary value head)."""
    d = 3
    pairs = density * b * n
    f_fwd = fwd_flops_per_pair(d, vdim)
    f_dual = DUAL_FACTOR * (bwd_dx_flops_per_pair(d, vdim)
                            + bwd_dn_flops_per_pair(d, vdim))
    f_bnd = value_only_flops_per_pair(d, vdim) + bwd_dn_flops_per_pair(
        d, vdim) * 0.5
    flops = pairs * (rk4_evals * f_fwd + f_fwd + f_dual + f_bnd)
    launches = rk4_evals + 4
    bytes_ = launches * _kernel_stream_bytes(b, n, d, vdim, tb, tn,
                                             (1 + d) * vdim)
    return EpochCost(flops, bytes_, pairs)


def measured_tile_density(mix, spec, x, tb: int = 256, tn: int = 512):
    """Fraction of (query-tile, gaussian-tile) blocks the tile mask keeps
    (ops/field.py _tile_mask) — the culling factor for pair counts."""
    import jax.numpy as jnp
    import numpy as np
    from gaussian_fluids_tpu.ops import field as field_ops

    x = jnp.asarray(x)
    x = x[jnp.argsort(x[:, 0])]
    x_p = field_ops._pad_axis(x, tb, axis=0)
    valid_b = jnp.arange(x_p.shape[0]) < x.shape[0]
    dead = ~field_ops.in_domain_mask(mix, spec)
    dead_n = field_ops._pad_axis(dead.astype(jnp.float32), tn, axis=0,
                                 fill=1.0)
    mu_p = field_ops._pad_axis(mix.positions, tn, axis=0)
    s_p = field_ops._pad_axis(mix.scalings, tn, axis=0)
    tmask = field_ops._tile_mask(x_p, valid_b, mu_p, dead_n, s_p, spec,
                                 tb, tn)
    return float(np.asarray(jnp.mean(tmask.astype(jnp.float32))))


# ---------------------------------------------------------------------------
# Reference GPU bound (VERDICT item 6): the reference's 2D projection epoch
# (2D/advance.py:187-302) is LAUNCH/SYNC-LATENCY bound at leapfrog scale,
# not FLOP bound — its per-epoch device work at B=512, N=5041 is ~1e8 FLOPs
# (< 1 ms even at 1% of any modern GPU), but each eager epoch issues:
#
#   - taichi launches: advection_rk4 (1), get_grad_losses (1), boundary
#     get_losses (1), reinitialize_grid_ti (1, with a serialized
#     row-prefix-sum loop) = 4  (2D/GSR.py:549,365,256,194)
#   - torch eager ops: 8 zeros_like + data/vorticity math (~12) +
#     gradient_project 4x (~6 each, incl. one `(g1*g2).sum() < 0` HOST
#     SYNC per group, 2D/advance.py:189) + grad += (8) + aniso/vol/dpos
#     forward (~15) + .backward() (~30) + 4 single-tensor Adam steps
#     (~10 kernels each) + 4 plateau schedulers with float(metric) HOST
#     SYNC + zero_grad (8) + scalings.min().item() HOST SYNC
#     (2D/GSR.py:226) ~= 130 kernel launches and >= 6 host syncs/epoch.
#
# Bounds on a generously-modern GPU (RTX 4090 class; the reference needs
# only "CUDA 11+", README.md:17):
#   generous (unreachably fast): 3 us/launch, 5 us/sync, zero Python
#     dispatch cost -> 130*3 + 6*5 = 420 us/epoch -> ~2400 epochs/s
#   realistic eager PyTorch+Taichi: ~10 us/op dispatch, 20 us/sync
#     -> 130*10 + 6*20 = 1.42 ms/epoch -> ~700 epochs/s
REFERENCE_2D_EPOCH_BOUND = {"generous_eps": 2400.0, "realistic_eps": 700.0}


def reference_gpu_bound_2d():
    """(low, high) plausible epochs/s for the reference 2D projection on a
    modern GPU at leapfrog scale. See the derivation above."""
    return (REFERENCE_2D_EPOCH_BOUND["realistic_eps"],
            REFERENCE_2D_EPOCH_BOUND["generous_eps"])


# ---------------------------------------------------------------------------
# Reference GPU bound, 3D scale (VERDICT r2 item 3): the reference's fused
# 3D kernel (3D/GSR.py:254-597) per projection epoch at ring_collide scale.
#
# Work model, measured from a real mid-run checkpoint (frame 11,
# N=64,000, B=8,192; scripts in-session, see BASELINE.md r3 section):
#   - VISITED pairs: the kernel walks all Gaussians in the 27 cells
#     around each query (grid_scale = support radius of the LARGEST
#     Gaussian, 3D/GSR.py:247-252; measured 0.052 -> ~20^3 grid, 6.7
#     Gaussians/cell): ~199 visited/query = ~1.63M pairs/epoch. Per
#     visited pair both passes rebuild quat-normalize + R + cov_inv
#     (~150 FLOP); pass 2 adds the derivative chain (~1,500 FLOP) for
#     CONTRIBUTING pairs only (g >= clamp).
#   - CONTRIBUTING pairs: measured ~24/query = ~197k/epoch interior,
#     ~43k boundary.
#   - ATOMIC adds: 39 atomic f32 += per contributing interior pair
#     (13 per loss bucket x {vor, hel, div}, counted from
#     3D/GSR.py:495-556) + 13 per boundary pair = ~8.2M atomics/epoch.
#
# GPU floors (4090/A100 class, the reference needs "CUDA 11+"):
#   - atomics: generous 64e9 atomic-f32/s (spread-address L2 peak,
#     microbenchmark class), realistic 8e9/s under per-address collision
#     (~3 colliders/address/epoch here, so closer to the spread peak;
#     realistic figure also absorbs the pass-2 divergence of the
#     per-pair derivative chain).
#   - compute: ~2 GFLOP/epoch (all passes + RK4 backtrace) at 80 TFLOP/s
#     fp32 -> 25 us; never binding.
#   - launch/sync floor: 4 Taichi launches + ~130 eager torch ops +
#     >= 6 host syncs (PCGrad dots inlined 4x, 3D/advance.py:202-225,
#     plateau schedulers, grid_scale .item()), same structure as 2D.
REFERENCE_3D_ATOMIC_RATE = {"generous": 64e9, "realistic": 8e9}
REFERENCE_3D_LAUNCH_FLOOR_S = {"generous": 420e-6, "realistic": 1.42e-3}


def reference_gpu_bound_3d(contributing_pairs: float,
                           boundary_pairs: float,
                           visited_pairs: float) -> tuple:
    """(realistic_eps, generous_eps) plausible epochs/s for the reference
    3D projection epoch. Each bound = 1 / (atomic time + launch/sync
    floor); compute time is checked but never binding at these scales."""
    atomics = 39.0 * contributing_pairs + 13.0 * boundary_pairs
    flops = 2.0 * visited_pairs * 150.0 + contributing_pairs * 1500.0
    out = []
    for mode in ("realistic", "generous"):
        t = (atomics / REFERENCE_3D_ATOMIC_RATE[mode]
             + REFERENCE_3D_LAUNCH_FLOOR_S[mode])
        t = max(t, flops / 80e12)
        out.append(1.0 / t)
    return tuple(out)


def measured_pair_stats_3d(mix, spec, x, boundary_x=None):
    """(visited, contributing, boundary_contributing) pairs per epoch for
    the reference's kernel at this mixture/batch — the inputs to
    reference_gpu_bound_3d. ``visited`` simulates the reference's
    27-cell walk at its dynamic grid scale; ``contributing`` counts
    g >= clamp exactly."""
    import numpy as np
    from gaussian_fluids_tpu.ops import rotations as rot_ops
    import jax.numpy as jnp

    alive = np.asarray(mix.alive)
    mu = np.asarray(mix.positions)[alive]
    s = np.asarray(mix.scalings)[alive]
    P = np.asarray(rot_ops.precision_matrix(
        jnp.asarray(s), jnp.asarray(np.asarray(mix.rotations)[alive]), 3))
    c = spec.clamp_threshold
    x = np.asarray(x)

    def contributing(pts):
        tot = 0
        for i in range(0, pts.shape[0], 512):
            d = pts[i:i + 512, None, :] - mu[None]
            quad = np.einsum("bni,nij,bnj->bn", d, P, d)
            tot += int((np.exp(-0.5 * quad) >= c).sum())
        return tot

    # reference dynamic grid scale (3D/GSR.py:247-252)
    gs = max(float(np.sqrt(-2 * np.log(c)) * np.exp(-s.min())),
             float(spec.min_grid_scale))
    lo = np.asarray(spec.lo, np.float32)
    nx = int(np.ceil((np.asarray(spec.hi) - lo).max() / gs)) + 2
    ci = np.clip(((mu - lo + gs) / gs).astype(int), 0, nx - 1)
    occ = {}
    for t in map(tuple, ci):
        occ[t] = occ.get(t, 0) + 1
    xi = np.clip(((x - lo + gs) / gs).astype(int), 0, nx - 1)
    visited = 0
    for q in range(x.shape[0]):
        a, b, cc = xi[q]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    visited += occ.get((a + dx, b + dy, cc + dz), 0)
    return (float(visited), float(contributing(x)),
            float(contributing(np.asarray(boundary_x)))
            if boundary_x is not None else 0.0)
