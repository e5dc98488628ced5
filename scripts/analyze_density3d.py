"""Physics validation of a smoke-density replay from its .vti sequence.

The replay (advance_density3d.py, reference 3D/advance_density.py:98-115)
is semi-Lagrangian: every grid node RK4-backtraces through the frame's
velocity checkpoint and trilinearly interpolates the previous density.
Trilinear interpolation is a convex combination of the 8 surrounding
nodes, which gives two *strict* invariants this analyzer enforces, plus
scene-level physics it reports:

  * max density non-increasing and min >= 0 per frame (convexity);
  * total mass ~ conserved (semi-Lagrangian advection is not exactly
    conservative — numerical diffusion smears the ring — but mass must
    stay bounded, not drain or blow up);
  * per-tag density center of mass and radial/axial spread: for
    ring_collide the two rings approach the collision plane (axial |x-cx|
    of the COMs shrinks) and then the smoke expands radially (the
    density-weighted radius about the collision axis grows) — the same
    signature analyze_ring3d.py reads off the vorticity field, here
    measured on the rendered smoke itself.

Pure numpy over the .vti files — runs on the host with no device.

Usage: python scripts/analyze_density3d.py <run_dir> [stride]
"""
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gaussian_fluids_tpu.io.vti import read_vti_array  # noqa: E402

run_dir = sys.argv[1]
stride = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def sequences():
    pat = re.compile(r"density_([a-z])_(\d+)\.vti$")
    out = {}
    for f in glob.glob(os.path.join(run_dir, "density_*_*.vti")):
        m = pat.search(f)
        if m:
            out.setdefault(m.group(1), {})[int(m.group(2))] = f
    return {tag: dict(sorted(fr.items())) for tag, fr in sorted(out.items())}


def stats(V):
    mass = float(V.sum())
    vmax = float(V.max())
    vmin = float(V.min())
    com = np.zeros(3)
    spread_r = spread_ax = float("nan")
    if mass > 0:
        nx, ny, nz = V.shape
        # normalized [0,1) node coordinates per axis; density-weighted
        # moments via axis sums (no 512^3 meshgrid materialization)
        axsum = [V.sum(axis=tuple(j for j in range(3) if j != i))
                 for i in range(3)]
        coords = [np.arange(n) / n for n in (nx, ny, nz)]
        com = np.array([float((c * s).sum()) / mass
                        for c, s in zip(coords, axsum)])
        # spreads about the COM: axial = x (the ring_collide collision
        # axis, 3D/init_cond.py ring normals +/-x), radial = sqrt(y^2+z^2)
        spread_ax = float((np.abs(coords[0] - com[0]) * axsum[0]).sum()
                          / mass)
        y2 = ((coords[1] - com[1]) ** 2 * axsum[1]).sum() / mass
        z2 = ((coords[2] - com[2]) ** 2 * axsum[2]).sum() / mass
        spread_r = float(np.sqrt(y2 + z2))
    return mass, vmax, vmin, com, spread_ax, spread_r


def main():
    seqs = sequences()
    if not seqs:
        print(f"no density_*_*.vti in {run_dir}")
        return 1
    failures = []
    for tag, fr in seqs.items():
        print(f"== density '{tag}' ({len(fr)} frames)")
        print(f"{'frame':>5} {'mass/mass0':>10} {'max':>9} {'min':>10} "
              f"{'com':>23} {'ax_spread':>9} {'r_spread':>9}")
        mass0 = prev_max = None
        ks = [k for i, k in enumerate(sorted(fr)) if i % stride == 0]
        if sorted(fr)[-1] not in ks:
            ks.append(sorted(fr)[-1])
        for k in ks:
            mass, vmax, vmin, com, sax, sr = stats(read_vti_array(fr[k]))
            if mass0 is None:
                mass0 = mass if mass else 1.0
            if vmin < -1e-6:
                failures.append(f"{tag}[{k}]: min {vmin} < 0")
            if prev_max is not None and vmax > prev_max * (1 + 1e-5):
                failures.append(
                    f"{tag}[{k}]: max grew {prev_max} -> {vmax}")
            prev_max = vmax
            com_s = "(" + ",".join(f"{c:.3f}" for c in com) + ")"
            print(f"{k:>5} {mass / mass0:>10.4f} {vmax:>9.4f} "
                  f"{vmin:>10.2e} {com_s:>23} {sax:>9.4f} {sr:>9.4f}")
    if failures:
        print("FAILED invariants:")
        for f in failures:
            print("  " + f)
        return 1
    print("invariants OK (min >= 0, max non-increasing)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
