"""Fidelity analysis of a vortices_pass-family 2D run from its saved
checkpoints (reference workload: dt=.01, last_time=5 -> 500 frames,
README.md:78; variants vortices_pass / _narrow / _noslip / _particles).

The scene is a vortex pair translating toward a gap between two circular
obstacles. For sampled frames this reports:
  * divergence residual (mean |div|, max |div|) — the parity metric the
    reference prints per 100 epochs (2D/advance.py:271,286);
  * grid mean |vorticity| (conservation check);
  * the +/- vortex core positions — the pair must keep translating in +x
    and squeeze through the gap for the run to preserve the physics;
  * the boundary-flux residual mean/max |u.n| on each obstacle circle —
    how well the projection's type-2 free-slip constraint (reference
    2D/init_cond.py:325-346) is honored, normalized against the vortex
    pair's self-advection speed.

Usage: python scripts/analyze_vortices_pass2d.py <run_dir> [scene] [stride]
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
scene_name = sys.argv[2] if len(sys.argv) > 2 else "vortices_pass"
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 50
RES = 160
M_FLUX = 256


def frames():
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            out[int(m.group(1))] = f
    return dict(sorted(out.items()))


def cores(vor, xs, ys):
    """Strongest positive and negative vorticity extremum (the pair)."""
    i, j = np.unravel_index(np.argmax(vor), vor.shape)
    k, l = np.unravel_index(np.argmin(vor), vor.shape)
    return (xs[j], ys[i], vor[i, j]), (xs[l], ys[k], vor[k, l])


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

scene = get_scene_2d(scene_name)
sf = scene.scaling_factor
d = scene.visualize_domain
xs = np.linspace(d[0] + 1e-3, d[1] - 1e-3, RES)
ys = np.linspace(d[2] + 1e-3, d[3] - 1e-3, RES)
pts = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
pts = pts.astype(np.float32)

info = scene.info
obstacles = []
for k in ("obstacle_pos1", "obstacle_pos2", "obstacle_pos"):
    if k in info:
        obstacles.append((info[k], info["obstacle_radius"]))
flux_probes = [analysis.circle_points(c, r, M_FLUX) for c, r in obstacles]

sampled = [n for n in all_frames if n % stride == 0]
if sampled[-1] != max(all_frames):
    sampled.append(max(all_frames))

# no-slip variant: the circles carry a type-1 Dirichlet u=0 target
# (reference 2D/init_cond.py:419-428 sample_for_vortices_pass_1), so the
# TANGENTIAL velocity on them must vanish too, not just the normal flux.
noslip = scene_name == "vortices_pass_noslip"

hdr_fl = " ".join(f"{'flux' + str(i):>9}" for i in range(len(obstacles)))
if noslip:
    hdr_fl += " " + " ".join(
        f"{'slip' + str(i):>9}" for i in range(len(obstacles)))
print(f"scene={scene_name}, obstacles={len(obstacles)}")
print(f"{'frame':>6} {'N':>6} {'mean|div|':>11} {'max|div|':>10} "
      f"{'mean|vor|':>10} {'core+ (x,y)':>16} {'core- (x,y)':>16} {hdr_fl}")
flux_hist, slip_hist = [], []
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    _, jac = field.eval_on_grid(mix, spec, pts * sf)
    jac = np.asarray(jac)
    div = analysis.divergence_np(jac)
    vor = analysis.curl2d_np(jac).reshape(RES, RES)
    cp, cn = cores(vor, xs, ys)
    # mean flow speed on the grid normalizes the flux residual
    val, _ = field.eval_on_grid(mix, spec, pts * sf)
    speed = np.linalg.norm(np.asarray(val) / sf, axis=-1).mean()
    fl, sl = [], []
    for bp, bn in flux_probes:
        v = np.asarray(field.eval_on_grid(
            mix, spec, (bp * sf).astype(np.float32))[0]) / sf
        mean_f, _ = analysis.flux_stats(v, bn)
        fl.append(mean_f / max(speed, 1e-12))
        if noslip:
            tang = np.stack([-bn[:, 1], bn[:, 0]], -1)
            mean_t, _ = analysis.flux_stats(v, tang)
            sl.append(mean_t / max(speed, 1e-12))
    if n >= 1:
        flux_hist.append(fl)
        slip_hist.append(sl)
    fl_s = " ".join(f"{f:9.4f}" for f in fl + sl)
    print(f"{n:6d} {int(mix.alive.sum()):6d} {np.abs(div).mean():11.3e} "
          f"{np.abs(div).max():10.3e} {np.abs(vor).mean():10.4f} "
          f"({cp[0]:+.2f},{cp[1]:+.2f})  ({cn[0]:+.2f},{cn[1]:+.2f})  "
          f"{fl_s}")

dts = frame_time_stats(all_frames)
if dts.size:
    print(f"# per-frame wall-clock over {dts.size} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f} "
          f"s, p90 {np.percentile(dts, 90):.1f} s")
print("# flux columns: mean |u.n| on each obstacle circle / grid mean "
      "|u| (0 = perfectly impermeable)")
if noslip:
    print("# slip columns: mean |u.t| (tangential) on each circle / grid "
          "mean |u| — the type-1 Dirichlet u=0 target adds this on top "
          "of impermeability")

# Explicit obstacle-constraint verdict over the post-initial frames
# (frame 0 is the raw initial fit, before any projection has enforced
# the samplers): the free-slip circles must be near-impermeable; the
# no-slip circles must also kill the tangential component.
if obstacles and flux_hist:
    med_fl = np.median(np.asarray(flux_hist), axis=0)
    ok = bool((med_fl < 0.05).all())
    msg = (f"median normalized obstacle flux per circle "
           f"{[f'{f:.4f}' for f in med_fl]} (threshold 0.05)")
    if noslip and slip_hist:
        med_sl = np.median(np.asarray(slip_hist), axis=0)
        ok = ok and bool((med_sl < 0.15).all())
        msg += (f"; median normalized tangential slip "
                f"{[f'{s:.4f}' for s in med_sl]} (threshold 0.15)")
    print(f"# VERDICT obstacle constraint: {'PASS' if ok else 'WEAK'} — "
          f"{msg}")
