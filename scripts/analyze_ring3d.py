"""Long-horizon analysis of a 3D vortex-ring run (ring_collide /
single_vortex_ring / leapfrog) from its saved checkpoints.

For sampled frames, evaluates the field on a coarse grid over the unit
domain (dense CPU path, chunked) and reports:
  * divergence residual (mean |div|, max |div|) — the parity metric the
    reference prints per 100 epochs (3D/advance.py:271,295);
  * mean |vorticity| (material conservation up to stretching);
  * the vorticity-weighted ring radius r_bar = E_|w|[ sqrt((y-.5)^2 +
    (z-.5)^2) ] — for ring_collide the two head-on rings merge and the
    combined ring expands radially, so r_bar must grow after collision;
  * the vorticity-weighted axial spread E_|w|[ |x - .5| ] — the rings
    approach the collision plane, so this shrinks and stays small.

Usage: python scripts/analyze_ring3d.py <run_dir> [stride] [res]
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
from gaussian_fluids_tpu.utils import analysis  # noqa: E402

run_dir = sys.argv[1]
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 5
RES = int(sys.argv[3]) if len(sys.argv) > 3 else 32
# optional scene name: when it has an obstacle mesh (ring_with_obstacle)
# an extra meshflux column probes |u.n| on the obstacle surface
scene_name = sys.argv[4] if len(sys.argv) > 4 else None


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
dts = np.asarray([d for d in dts if 1.0 <= d < 3600])
if dts.size:
    print(f"# per-frame wall-clock over {len(dts)} consecutive frames: "
          f"median {np.median(dts):.1f} s, p10 {np.percentile(dts, 10):.1f},"
          f" p90 {np.percentile(dts, 90):.1f}, mean {dts.mean():.1f}")

xs = np.linspace(0.0, 1.0, RES, dtype=np.float32)
pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
r_perp = np.sqrt((pts[:, 1] - 0.5) ** 2 + (pts[:, 2] - 0.5) ** 2)
ax_dist = np.abs(pts[:, 0] - 0.5)
# domain-wall impermeability probe (the boundary constraint the 3D
# projection enforces at lambda=10 — reference 3D/advance.py:230-235)
wall_pts, wall_nrm = analysis.box_points((0.0, 0.0, 0.0),
                                         (1.0, 1.0, 1.0), 256)
wall_pts = wall_pts.astype(np.float32)

mesh_pts = mesh_nrm = None
if scene_name is not None:
    from gaussian_fluids_tpu.scenes import get_scene_3d
    scene = get_scene_3d(scene_name)
    if scene.mesh_sampler is not None:
        p, nr = scene.mesh_sampler.sample(jax.random.PRNGKey(0), 1024)
        mesh_pts = np.asarray(p, np.float32)
        mesh_nrm = np.asarray(nr)

sampled = sorted(set([n for n in all_frames if n % stride == 0]
                     + [max(all_frames)]))
mesh_hdr = f" {'meshflux':>9}" if mesh_pts is not None else ""
print(f"{'frame':>6} {'N':>7} {'mean|div|':>11} {'max|div|':>10} "
      f"{'mean|vor|':>10} {'r_ring':>7} {'ax_spread':>9} {'wallflux':>9}"
      f"{mesh_hdr}")
for n in sampled:
    mix, spec = load_checkpoint(all_frames[n])
    val, jac = field.eval_on_grid(mix, spec, pts)
    jac = np.asarray(jac)
    div = analysis.divergence_np(jac)
    vor = analysis.curl3d_np(jac)
    w = np.linalg.norm(vor, axis=-1)
    speed = np.linalg.norm(np.asarray(val), axis=-1).mean()
    wall_v = np.asarray(field.eval_on_grid(mix, spec, wall_pts)[0])
    wall_flux, _ = analysis.flux_stats(wall_v, wall_nrm)
    # ring geometry from the strong cores only: the weak background
    # vorticity fills the whole domain and would dilute the weighted radius
    w = w * (w > 0.25 * w.max())
    wsum = w.sum() + 1e-30
    mesh_col = ""
    if mesh_pts is not None:
        mv = np.asarray(field.eval_on_grid(mix, spec, mesh_pts)[0])
        mf, _ = analysis.flux_stats(mv, mesh_nrm)
        mesh_col = f" {mf / max(speed, 1e-12):9.4f}"
    print(f"{n:6d} {int(mix.alive.sum()):7d} {np.abs(div).mean():11.3e} "
          f"{np.abs(div).max():10.3e} {np.linalg.norm(vor, axis=-1).mean():10.4f} "
          f"{(w * r_perp).sum() / wsum:7.3f} "
          f"{(w * ax_dist).sum() / wsum:9.3f} "
          f"{wall_flux / max(speed, 1e-12):9.4f}{mesh_col}")
print("# wallflux: mean |u.n| on the domain box faces / grid mean |u| "
      "(0 = impermeable walls)"
      + ("; meshflux: same on the obstacle mesh surface"
         if mesh_pts is not None else ""))
