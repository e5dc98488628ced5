"""Long-horizon analysis of a Karman-2D run from its saved checkpoints
(reference workload: dt=.05, last_time=10 -> 200 frames, README.md:85;
N = 400x60 = 24,000 Gaussians, moving inflow domain).

For sampled frames, evaluates the field on the visualize domain (in the
scaled target space the checkpoints live in) and reports:
  * divergence residual (mean |div|, max |div|) — the parity metric the
    reference prints per 100 epochs (2D/advance.py:271,286);
  * vortex-street structure: the alternating-sign vorticity cores shed
    behind the cylinder. We count sign alternations of the cross-stream-max
    vorticity along x downstream of the cylinder — a laminar (unseparated)
    flow has 0-1; an established street shows several alternations that
    migrate downstream over frames;
  * mean |vorticity| in the wake (growing from ~0 as the street develops).

Usage: python scripts/analyze_karman2d.py <run_dir> [stride]
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
from gaussian_fluids_tpu.utils.analysis import (  # noqa: E402
    shedding_stats, street_alternations)

run_dir = sys.argv[1]
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 20
RES_X, RES_Y = 250, 100

scene = get_scene_2d("karman")
sf = scene.scaling_factor
# cylinder: center/radius from the scene registry info, scaled
cx, cy = np.asarray(scene.info["obstacle_pos"]) * sf
radius = scene.info["obstacle_radius"] * sf
vx0, vx1, vy0, vy1 = (np.asarray(scene.visualize_domain) * sf)


def frames():
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            out[int(m.group(1))] = f
    return dict(sorted(out.items()))


all_frames = frames()
if not all_frames:
    sys.exit(f"no gaussian_velocity_*.pt checkpoints found in {run_dir!r}")
ns = sorted(all_frames)
dts = [os.path.getmtime(all_frames[b]) - os.path.getmtime(all_frames[a])
       for a, b in zip(ns, ns[1:]) if b == a + 1]
dts = np.asarray([d for d in dts if 0 < d < 600])
if dts.size:
    print(f"# per-frame wall-clock over {len(dts)} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f},"
          f" p90 {np.percentile(dts, 90):.1f}, mean {dts.mean():.1f}")

sampled = sorted(set([n for n in all_frames if n % stride == 0]
                     + [max(all_frames)]))
print(f"{'frame':>6} {'N':>7} {'mean|div|':>11} {'max|div|':>10} "
      f"{'wake mean|vor|':>14} {'street alternations':>20}")
xs = np.linspace(vx0 + 1e-3, vx1 - 1e-3, RES_X)
ys = np.linspace(vy0 + 1e-3, vy1 - 1e-3, RES_Y)
pts = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
mask_cyl = ((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2
            > (1.2 * radius) ** 2)
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    _, jac = field.eval_on_grid(mix, spec, pts)
    div = analysis.divergence_np(jac)[mask_cyl]
    vor = analysis.curl2d_np(jac).reshape(RES_Y, RES_X)
    alt, wake_vor = street_alternations(vor, xs, cx, radius)
    print(f"{n:6d} {int(mix.alive.sum()):7d} {np.abs(div).mean():11.3e} "
          f"{np.abs(div).max():10.3e} {wake_vor:14.4f} {alt:20d}")

# ---- shedding frequency / Strouhal number ----
# Cross-stream velocity v_y probed at a fixed point a few diameters behind
# the cylinder, one sample per frame: an established street makes it
# oscillate; f = shedding frequency, St = f * D / U (U, D in original
# units — the target-space scaling sf cancels). The crossing count and
# duration assume uniform dt spacing, so only the longest gapless
# (consecutive frame numbers) run of checkpoints is used.
dt_env = float(os.environ.get("GF_DT", "0.05"))
print(f"# assuming frame spacing dt={dt_env} s "
      f"(set GF_DT to the run's --dt if different)")
best = cur = [ns[0]]
for a, b in zip(ns, ns[1:]):
    cur = cur + [b] if b == a + 1 else [b]
    if len(cur) > len(best):
        best = cur
if len(best) < len(ns):
    print(f"# note: checkpoints are not consecutive; probing the longest "
          f"gapless run, frames {best[0]}..{best[-1]} "
          f"({len(best)} of {len(ns)})")
probe = np.asarray([[cx + 6.0 * radius, cy]], np.float32)
vy = []
for n in best:
    mix, spec = load_checkpoint(all_frames[n])
    vy.append(float(field.value(mix, spec, probe, need_dx=False)[0, 1]))
crossings, dur, freq, st = shedding_stats(
    vy, dt_env, 2.0 * scene.info["obstacle_radius"],
    scene.info["v_magnitude"])
if freq is not None:
    print(f"# probe v_y at x=cx+6r over frames "
          f"{best[len(vy) // 2]}..{best[-1]}"
          f": {crossings} mean-crossings in {dur:.2f}s -> shedding "
          f"f={freq:.3f} Hz, Strouhal St=f*D/U={st:.3f} "
          f"(rigid-cylinder reference ~0.2)")
else:
    print(f"# no established shedding detected at the probe "
          f"({crossings} crossings)")
