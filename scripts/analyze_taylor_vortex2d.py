"""Fidelity analysis of a Taylor-vortex 2D run from its saved checkpoints
(reference workload: dt=.01, last_time=4 -> 400 frames, README.md:71).

The scene is two co-rotating Gaussian vortices (both +U, reference
2D/init_cond.py:169-191) at separation 1.6 with core radius a=0.5: the
pair must orbit its centroid while conserving vorticity. For sampled
frames this reports:
  * divergence residual (mean |div|, max |div|) — the parity metric
    (reference 2D/advance.py:271,286);
  * grid mean |vorticity| (material conservation);
  * the two positive core positions, their separation, and the pair's
    orientation angle — separation should stay ~constant pre-merger while
    the angle advances monotonically (solid-body-like co-rotation).

Usage: python scripts/analyze_taylor_vortex2d.py <run_dir> [stride]
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
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 40
RES = 160


def frames():
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            out[int(m.group(1))] = f
    return dict(sorted(out.items()))


def two_pos_cores(vor, xs, ys):
    """The two strongest positive local extrema (suppressing a
    neighborhood around the first so the second is the OTHER vortex)."""
    vv = vor.copy()
    found = []
    for _ in range(2):
        i, j = np.unravel_index(np.argmax(vv), vv.shape)
        found.append((xs[j], ys[i], vor[i, j]))
        r = RES // 8
        vv[max(0, i - r):i + r, max(0, j - r):j + r] = -np.inf
    return found


def frame_time_stats(all_frames):
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

scene = get_scene_2d("taylor_vortex")
sf = scene.scaling_factor
d = scene.visualize_domain
xs = np.linspace(d[0] + 1e-3, d[1] - 1e-3, RES)
ys = np.linspace(d[2] + 1e-3, d[3] - 1e-3, RES)
pts = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
pts = pts.astype(np.float32)

sampled = [n for n in all_frames if n % stride == 0]
if sampled[-1] != max(all_frames):
    sampled.append(max(all_frames))

print(f"{'frame':>6} {'N':>6} {'mean|div|':>11} {'max|div|':>10} "
      f"{'mean|vor|':>10} {'core1 (x,y)':>15} {'core2 (x,y)':>15} "
      f"{'sep':>6} {'angle':>7}")
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    _, jac = field.eval_on_grid(mix, spec, pts * sf)
    jac = np.asarray(jac)
    div = analysis.divergence_np(jac)
    vor = analysis.curl2d_np(jac).reshape(RES, RES)
    (x1, y1, w1), (x2, y2, w2) = two_pos_cores(vor, xs, ys)
    sep = float(np.hypot(x1 - x2, y1 - y2))
    ang = float(np.degrees(np.arctan2(y1 - y2, x1 - x2))) % 180.0
    print(f"{n:6d} {int(mix.alive.sum()):6d} {np.abs(div).mean():11.3e} "
          f"{np.abs(div).max():10.3e} {np.abs(vor).mean():10.4f} "
          f"({x1:+.2f},{y1:+.2f})  ({x2:+.2f},{y2:+.2f})  "
          f"{sep:6.3f} {ang:7.1f}")

dts = frame_time_stats(all_frames)
if dts.size:
    print(f"# per-frame wall-clock over {dts.size} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f} "
          f"s, p90 {np.percentile(dts, 90):.1f} s")
print("# sep: core separation (pre-merger ~1.6); angle: pair orientation "
      "in [0,180) deg — should advance as the pair co-rotates")
