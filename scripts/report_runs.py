"""Aggregate production run directories into a BASELINE.md-ready table.

For every ``output_*`` directory (or the dirs passed as arguments):
frame count, horizon, N growth (first -> peak -> last, read from the
checkpoint ``positions`` shape), and per-frame wall-clock stats from
checkpoint mtime deltas. Resume gaps (chain restarts) are excluded by
dropping deltas > 5x the median. Pure CPU.

Usage: python scripts/report_runs.py [dir ...]
"""
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def checkpoint_n(path):
    import torch
    d = torch.load(path, map_location="cpu", weights_only=False)
    return int(d["positions"].shape[0])


def report(run_dir):
    pat = re.compile(r"gaussian_velocity_(\d+)\.pt$")
    frames = {}
    for f in glob.glob(os.path.join(run_dir, "gaussian_velocity_*.pt")):
        m = pat.search(f)
        if m:
            frames[int(m.group(1))] = f
    if not frames:
        return None
    ks = sorted(frames)
    ns = {k: checkpoint_n(frames[k]) for k in (ks[0], ks[-1])}
    n_peak, k_peak = ns[ks[0]], ks[0]
    for k in ks:
        n = checkpoint_n(frames[k])
        if n > n_peak:
            n_peak, k_peak = n, k
    mt = np.array([os.path.getmtime(frames[k]) for k in ks])
    dt = np.diff(mt)
    dt = dt[dt >= 1.0]  # <1 s deltas are restored-copy artifacts
    if dt.size:
        med = np.median(dt)
        dt = dt[dt < 5 * med]  # drop resume gaps
    wall = (f"median {np.median(dt):.1f} s, p10 {np.percentile(dt, 10):.1f},"
            f" p90 {np.percentile(dt, 90):.1f} (n={dt.size})"
            if dt.size else "n/a")
    return (f"{run_dir}: frames {ks[0]}..{ks[-1]} ({len(ks)} ckpts), "
            f"N {ns[ks[0]]} -> peak {n_peak} (frame {k_peak}) -> "
            f"{ns[ks[-1]]}, per-frame wall {wall}")


def main():
    dirs = sys.argv[1:] or sorted(
        d for d in glob.glob("output_*") if os.path.isdir(d))
    for d in dirs:
        line = report(d)
        if line:
            print(line)


if __name__ == "__main__":
    main()
