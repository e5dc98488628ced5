"""Analytic-drift analysis of a Taylor-Green 2D run from its saved
checkpoints (reference workload: dt=.001, last_time=.2 -> 200 frames,
README.md:64).

Taylor-Green is a stationary solution of the incompressible Euler
equations, so the t=0 analytic field (reference 2D/init_cond.py:158-167 —
the one scene with a closed-form velocity AND Jacobian) stays the exact
solution for the whole horizon. For sampled frames this reports:
  * L1 velocity error vs the analytic field, relative to the analytic
    mean |u| (the fidelity gate SURVEY.md §4 names);
  * divergence residual (mean |div|, max |div|) — the parity metric the
    reference prints per 100 epochs (2D/advance.py:271,286);
  * grid mean |vorticity| vs analytic (conservation check);
plus per-frame wall-clock stats from checkpoint mtimes.

Usage: python scripts/analyze_taylor_green2d.py <run_dir> [stride]
"""
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gaussian_fluids_tpu.io.checkpoint import load_checkpoint  # noqa: E402
from gaussian_fluids_tpu.ops import field  # noqa: E402
from gaussian_fluids_tpu.scenes import get_scene_2d  # noqa: E402
from gaussian_fluids_tpu.utils import analysis  # noqa: E402

run_dir = sys.argv[1]
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 20
RES = 160


def frames():
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            out[int(m.group(1))] = f
    return dict(sorted(out.items()))


def frame_time_stats(all_frames):
    """Per-frame wall-clock from consecutive checkpoint mtimes (the
    north-star metric is per-frame wall-clock, BASELINE.md). Deltas over
    10 minutes are treated as run restarts and excluded."""
    ns = sorted(all_frames)
    dts = []
    for a, b in zip(ns, ns[1:]):
        if b - a != 1:
            continue
        dt = (os.path.getmtime(all_frames[b])
              - os.path.getmtime(all_frames[a]))
        if 1.0 <= dt < 600:  # <1 s = restored-copy mtime artifact, not a frame
            dts.append(dt)
    return np.asarray(dts)


all_frames = frames()
if not all_frames:
    sys.exit(f"no gaussian_velocity_*.pt in {run_dir}")

scene = get_scene_2d("taylor_green")
sf = scene.scaling_factor
d = scene.visualize_domain
xs = np.linspace(d[0] + 1e-3, d[1] - 1e-3, RES)
ys = np.linspace(d[2] + 1e-3, d[3] - 1e-3, RES)
pts = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
pts = pts.astype(np.float32)

ref_v = np.asarray(scene.velocity(pts))           # original space
ref_speed = np.abs(ref_v).mean()
ref_jac = np.asarray(scene.velocity_jac(pts))
ref_vor_mean = np.abs(analysis.curl2d_np(ref_jac)).mean()

sampled = [n for n in all_frames if n % stride == 0]
if sampled[-1] != max(all_frames):
    sampled.append(max(all_frames))

print(f"analytic mean|u| = {ref_speed:.4f}, mean|vor| = {ref_vor_mean:.4f}")
print(f"{'frame':>6} {'N':>6} {'relL1(u)':>9} {'mean|div|':>11} "
      f"{'max|div|':>10} {'mean|vor|':>10}")
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    # solver state lives in the scaled target space (registry2d.py:128)
    val, jac = field.eval_on_grid(mix, spec, pts * sf)
    vel = np.asarray(val) / sf                     # back to original
    err = np.abs(vel - ref_v).mean() / ref_speed
    jac = np.asarray(jac)                          # d(su)/d(sx) = du/dx
    div = analysis.divergence_np(jac)
    vor = analysis.curl2d_np(jac)
    print(f"{n:6d} {int(mix.alive.sum()):6d} {err:9.4f} "
          f"{np.abs(div).mean():11.3e} {np.abs(div).max():10.3e} "
          f"{np.abs(vor).mean():10.4f}")

dts = frame_time_stats(all_frames)
if dts.size:
    print(f"# per-frame wall-clock over {dts.size} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f} "
          f"s, p90 {np.percentile(dts, 90):.1f} s")
