"""Flow-diagnostic probes shared by the run analyzers (scripts/analyze_*).

The reference has no analysis tooling at all — its regression artifacts are
per-frame PNGs/VTIs (reference 2D/advance.py:359-362, SURVEY.md §4). These
probes formalize the two visual checks a reader makes on a Karman street
plot (alternating-sign cores behind the cylinder; periodic cross-stream
velocity) into numbers the tests and BASELINE.md can gate on.

Pure numpy; no jax, no I/O.
"""
from __future__ import annotations

import numpy as np


def street_alternations(vor: np.ndarray, xs: np.ndarray, cx: float,
                        radius: float, gate_frac: float = 0.1):
    """Count sign alternations of the vortex street along the wake.

    For each x column downstream of the cylinder (x > cx + 2*radius), take
    the strongest-|vorticity| row value; count sign changes along x of that
    profile, ignoring values below ``gate_frac`` of the wake's max |vor|
    (noise gate). A laminar, unseparated flow gives 0-1; an established
    Karman street gives several, migrating downstream over frames.

    Parameters: ``vor`` (Ny, Nx) vorticity grid, ``xs`` (Nx,) column
    coordinates. Returns ``(alternations, wake_mean_abs_vor)``.
    """
    wake = xs > cx + 2.0 * radius
    v = vor[:, wake]
    if v.size == 0:
        return 0, 0.0
    idx = np.argmax(np.abs(v), axis=0)
    prof = v[idx, np.arange(v.shape[1])]
    gate = gate_frac * np.abs(v).max()
    sgn = np.sign(prof) * (np.abs(prof) > gate)
    sgn = sgn[sgn != 0]
    alt = int(np.sum(sgn[1:] != sgn[:-1])) if sgn.size else 0
    return alt, float(np.abs(v).mean())


def shedding_stats(vy: np.ndarray, dt: float, diameter: float,
                   u_mag: float):
    """Estimate the vortex-shedding frequency and Strouhal number.

    ``vy`` is the cross-stream velocity probed at a fixed point behind the
    cylinder, one sample per frame (spacing ``dt`` seconds). Only the
    second half of the series is used (the established street; the first
    half is transient). The frequency comes from mean-crossings (two per
    period); St = f * D / U. Returns ``(crossings, duration_s, freq_hz,
    strouhal)`` with ``freq_hz``/``strouhal`` None when fewer than two
    crossings were seen (no established shedding).
    """
    vy = np.asarray(vy, dtype=np.float64)
    half = vy[len(vy) // 2:]
    sgn = np.sign(half - half.mean())
    sgn = sgn[sgn != 0]
    crossings = int(np.sum(sgn[1:] != sgn[:-1])) if sgn.size else 0
    dur = (len(half) - 1) * dt
    if crossings < 2 or dur <= 0:
        return crossings, dur, None, None
    freq = crossings / 2.0 / dur
    return crossings, dur, freq, freq * diameter / u_mag
