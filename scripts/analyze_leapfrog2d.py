"""Long-horizon fidelity analysis of a Leapfrog-2D run from its saved
checkpoints (reference workload: dt=.025, last_time=40 -> 1600 frames,
README.md:53).

For sampled frames, evaluates the field on a grid (dense CPU path) and
reports:
  * divergence residual (mean |div|, max |div|) — the parity metric the
    reference prints per 100 epochs (2D/advance.py:271,286);
  * grid mean of |vorticity| — 2D vorticity is materially conserved,
    so large decay indicates numerical dissipation;
  * the 4 vortex cores: local extrema of the vorticity field (2 positive,
    2 negative) — the leapfrogging pairs must stay distinct and keep
    translating in +x for the run to count as preserving the structure.

Usage: python scripts/analyze_leapfrog2d.py <run_dir> [stride]
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

import jax.numpy as jnp  # noqa: E402

from gaussian_fluids_tpu.io.checkpoint import load_checkpoint  # noqa: E402
from gaussian_fluids_tpu.ops import field  # noqa: E402
from gaussian_fluids_tpu.utils import analysis  # noqa: E402

run_dir = sys.argv[1]
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 100
RES = 160


def frames():
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            out[int(m.group(1))] = f
    return dict(sorted(out.items()))


def cores(vor, xs, ys, k=2):
    """Positions of the k strongest positive and negative local extrema."""
    out = []
    for sign in (1.0, -1.0):
        v = vor * sign
        found = []
        vv = v.copy()
        for _ in range(k):
            i, j = np.unravel_index(np.argmax(vv), vv.shape)
            found.append((xs[j], ys[i], v[i, j]))
            # suppress a neighborhood so the next max is a distinct core
            r = RES // 10
            vv[max(0, i - r):i + r, max(0, j - r):j + r] = -np.inf
        out.append(found)
    return out


def frame_time_stats(all_frames):
    """Per-frame wall-clock from consecutive checkpoint mtimes (the
    north-star metric is per-frame wall-clock, BASELINE.md). Deltas over
    10 minutes are treated as run restarts and excluded."""
    ns = sorted(all_frames)
    dts = []
    for a, b in zip(ns, ns[1:]):
        if b == a + 1:
            d = os.path.getmtime(all_frames[b]) - os.path.getmtime(
                all_frames[a])
            if 1.0 <= d < 600:  # <1 s = restored-copy mtime artifact
                dts.append(d)
    if not dts:
        return
    dts = np.asarray(dts)
    print(f"# per-frame wall-clock over {len(dts)} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f},"
          f" p90 {np.percentile(dts, 90):.1f}, mean {dts.mean():.1f}")


all_frames = frames()
if not all_frames:
    sys.exit(f"no gaussian_velocity_*.pt checkpoints found in {run_dir!r}")
frame_time_stats(all_frames)
sampled = [n for n in all_frames if n % stride == 0] + [max(all_frames)]
sampled = sorted(set(sampled))
print(f"{'frame':>6} {'mean|div|':>11} {'max|div|':>10} {'mean|vor|':>10} "
      f" cores (+): (x, y, w)  cores (-): (x, y, w)")
first_vor_sum = None
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    xs = np.linspace(spec.lo[0] + 1e-3, spec.hi[0] - 1e-3, RES)
    ys = np.linspace(spec.lo[1] + 1e-3, spec.hi[1] - 1e-3, RES)
    pts = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    _, jac = field.eval_on_grid(mix, spec, pts)
    div = analysis.divergence_np(jac)
    vor = analysis.curl2d_np(jac).reshape(RES, RES)
    vor_sum = float(np.abs(vor).mean())
    if first_vor_sum is None:
        first_vor_sum = vor_sum
    cp, cn = cores(vor, xs, ys)
    fmt = lambda cs: " ".join(f"({x:+.2f},{y:+.2f},{w:+.2f})"
                              for x, y, w in cs)
    print(f"{n:6d} {np.abs(div).mean():11.3e} {np.abs(div).max():10.3e} "
          f"{vor_sum:10.4f}  +:{fmt(cp)}  -:{fmt(cn)}")
print(f"# |vor| retention vs first sampled frame: "
      f"{vor_sum / first_vor_sum * 100:.1f}%")
