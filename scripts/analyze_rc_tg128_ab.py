"""Full-horizon fidelity A/B: ring_collide advanced with cached targets
(--target_grid 128) vs the exact-target production run (VERDICT r5 item
3b). Both runs share frame 0; for every common frame this compares the
physics the projection is asked to enforce:

  * divergence residual (mean/max |div| on a RES^3 grid) — the parity
    metric (reference 3D/advance.py:271,295);
  * mean |vorticity| and the ring morphology (vorticity-weighted ring
    radius + axial spread, strong-core weighted as in analyze_ring3d.py);
  * wall impermeability (mean |u.n| on the box faces / mean |u|).

Verdict: the cached-target run PASSES if its per-frame mean |div| stays
within 25% of (or below) the exact run's, and the ring morphology tracks
within 0.02 absolute — i.e. the 1.8x epoch speedup costs no fidelity.

Usage: python scripts/analyze_rc_tg128_ab.py [exact_dir] [cached_dir]
       [stride] [res]
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

exact_dir = sys.argv[1] if len(sys.argv) > 1 else "output_3d_ring_collide"
cached_dir = sys.argv[2] if len(sys.argv) > 2 else "output_3d_rc_tg128"
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 4
RES = int(sys.argv[4]) if len(sys.argv) > 4 else 32


def frames(d):
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    return dict(sorted(
        (int(m.group(1)), f)
        for f in glob.glob(os.path.join(d, "gaussian_velocity_*.pt"))
        if (m := pat.search(f))))


fe, fc = frames(exact_dir), frames(cached_dir)
common = sorted(set(fe) & set(fc))
if len(common) < 2:
    sys.exit(f"not enough common frames: exact {sorted(fe)[-3:]}, "
             f"cached {sorted(fc)[-3:]}")
sampled = sorted(set([n for n in common if n % stride == 0] + [common[-1]]))

xs = np.linspace(0.0, 1.0, RES, dtype=np.float32)
pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
r_perp = np.sqrt((pts[:, 1] - 0.5) ** 2 + (pts[:, 2] - 0.5) ** 2)
wall_pts, wall_nrm = analysis.box_points((0.0, 0.0, 0.0),
                                         (1.0, 1.0, 1.0), 256)
wall_pts = wall_pts.astype(np.float32)


def metrics(ck):
    mix, spec = load_checkpoint(ck)
    val, jac = field.eval_on_grid(mix, spec, pts)
    jac = np.asarray(jac)
    div = analysis.divergence_np(jac)
    vor = analysis.curl3d_np(jac)
    w = np.linalg.norm(vor, axis=-1)
    speed = np.linalg.norm(np.asarray(val), axis=-1).mean()
    wall_v = np.asarray(field.eval_on_grid(mix, spec, wall_pts)[0])
    wall_flux, _ = analysis.flux_stats(wall_v, wall_nrm)
    wm = w * (w > 0.25 * w.max())
    return dict(n=int(mix.alive.sum()),
                div_mean=float(np.abs(div).mean()),
                div_max=float(np.abs(div).max()),
                vor_mean=float(w.mean()),
                r_ring=float((wm * r_perp).sum() / (wm.sum() + 1e-30)),
                wallflux=float(wall_flux / max(speed, 1e-12)))


print(f"# exact={exact_dir} cached={cached_dir} res={RES}")
print(f"{'frame':>6} | {'mean|div| ex':>12} {'cached':>10} {'ratio':>6} | "
      f"{'mean|vor| ex':>12} {'cached':>10} | {'r_ring ex':>9} "
      f"{'cached':>7} | {'wallflux ex':>11} {'cached':>7}")
worst_ratio, worst_dr = 0.0, 0.0
for n in sampled:
    me, mc = metrics(fe[n]), metrics(fc[n])
    ratio = mc["div_mean"] / max(me["div_mean"], 1e-12)
    dr = abs(mc["r_ring"] - me["r_ring"])
    if n > 0:  # frame 0 is shared, ratio 1 by construction
        worst_ratio = max(worst_ratio, ratio)
        worst_dr = max(worst_dr, dr)
    print(f"{n:6d} | {me['div_mean']:12.3e} {mc['div_mean']:10.3e} "
          f"{ratio:6.2f} | {me['vor_mean']:12.4f} {mc['vor_mean']:10.4f} | "
          f"{me['r_ring']:9.3f} {mc['r_ring']:7.3f} | "
          f"{me['wallflux']:11.4f} {mc['wallflux']:7.4f}")

ok = worst_ratio <= 1.25 and worst_dr <= 0.02
print(f"# VERDICT: {'PASS' if ok else 'FAIL'} — worst cached/exact "
      f"mean|div| ratio {worst_ratio:.2f} (gate 1.25), worst |r_ring| "
      f"drift {worst_dr:.3f} (gate 0.02) over frames {sampled[0]}..."
      f"{sampled[-1]}")
