"""Unit tests for the shared flow-diagnostic probes (utils/analysis.py).

These formalize the reference's visual regression checks (SURVEY.md §4:
per-frame PNGs were the only artifacts) into numeric gates.
"""
import numpy as np

from gaussian_fluids_tpu.utils.analysis import (shedding_stats,
                                                street_alternations)


def synthetic_street(n_cores=6, res=(80, 200), x_range=(0.0, 20.0)):
    """Alternating-sign Gaussian vorticity cores along the wake axis."""
    ny, nx = res
    xs = np.linspace(*x_range, nx)
    ys = np.linspace(-4.0, 4.0, ny)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    vor = np.zeros_like(X)
    for i in range(n_cores):
        cx = 6.0 + 2.0 * i
        cy = 1.0 if i % 2 == 0 else -1.0
        sgn = 1.0 if i % 2 == 0 else -1.0
        vor += sgn * np.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / 0.5)
    return vor, xs


def test_street_alternations_counts_cores():
    vor, xs = synthetic_street(n_cores=6)
    # cylinder at x=2, r=0.5 -> wake starts at x>3, upstream of every core
    alt, wake_vor = street_alternations(vor, xs, cx=2.0, radius=0.5)
    assert alt == 5  # 6 alternating cores -> 5 sign changes
    assert wake_vor > 0


def test_street_alternations_laminar_is_quiet():
    vor = np.full((40, 100), 1e-6)
    xs = np.linspace(0.0, 10.0, 100)
    alt, _ = street_alternations(vor, xs, cx=2.0, radius=0.5)
    assert alt == 0


def test_street_alternations_empty_wake():
    vor, xs = synthetic_street()
    alt, wake_vor = street_alternations(vor, xs, cx=100.0, radius=1.0)
    assert (alt, wake_vor) == (0, 0.0)


def test_shedding_stats_recovers_sine_frequency():
    dt, f_true = 0.05, 1.25
    t = np.arange(400) * dt
    vy = np.sin(2 * np.pi * f_true * t)
    crossings, dur, freq, st = shedding_stats(vy, dt, diameter=0.5,
                                              u_mag=2.0)
    assert freq is not None
    assert abs(freq - f_true) / f_true < 0.1
    assert abs(st - f_true * 0.5 / 2.0) / (f_true * 0.25) < 0.1


def test_shedding_stats_flat_signal_no_shedding():
    vy = np.zeros(50)
    crossings, dur, freq, st = shedding_stats(vy, 0.05, 0.5, 2.0)
    assert freq is None and st is None


def test_numpy_curl_div_twins_match_jnp():
    """utils.analysis curl/div host twins are pinned to solver.losses —
    the viz/analyzer sweeps use the numpy versions to avoid round-tripping
    whole grids through the device link."""
    from gaussian_fluids_tpu.solver import losses
    from gaussian_fluids_tpu.utils import analysis

    rng = np.random.RandomState(0)
    j2 = rng.randn(17, 2, 2).astype(np.float32)
    j3 = rng.randn(17, 3, 3).astype(np.float32)
    np.testing.assert_allclose(analysis.curl2d_np(j2),
                               np.asarray(losses.curl2d(j2)), rtol=1e-6)
    np.testing.assert_allclose(analysis.curl3d_np(j3),
                               np.asarray(losses.curl3d(j3)), rtol=1e-6)
    np.testing.assert_allclose(analysis.divergence_np(j3),
                               np.asarray(losses.divergence(j3)), rtol=1e-6)
    np.testing.assert_allclose(analysis.divergence_np(j2),
                               np.asarray(losses.divergence(j2)), rtol=1e-6)


def test_circle_flux_probe():
    from gaussian_fluids_tpu.utils import analysis

    pts, nrm = analysis.circle_points((1.0, -2.0), 0.5, 64)
    np.testing.assert_allclose(
        np.linalg.norm(pts - np.asarray([1.0, -2.0]), axis=-1), 0.5,
        rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, rtol=1e-6)
    # a purely tangential field has zero flux; a radial one has |u|
    tang = np.stack([-nrm[:, 1], nrm[:, 0]], -1) * 3.0
    mean_t, max_t = analysis.flux_stats(tang, nrm)
    assert max_t < 1e-6
    mean_r, max_r = analysis.flux_stats(2.0 * nrm, nrm)
    np.testing.assert_allclose([mean_r, max_r], [2.0, 2.0], rtol=1e-6)


def test_box_flux_probe():
    from gaussian_fluids_tpu.utils import analysis

    pts, nrm = analysis.box_points((0.0, 0.0, 0.0), (1.0, 2.0, 3.0), 32)
    assert pts.shape == (192, 3) and nrm.shape == (192, 3)
    # every point sits on exactly one face, normal pointing outward there
    on_face = (np.isclose(pts, [0, 0, 0]) | np.isclose(pts, [1, 2, 3]))
    assert (on_face.sum(-1) >= 1).all()
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0)
    # u_i = sin(pi (x_i - lo_i) / L_i) vanishes on both i-faces, so the
    # normal component is exactly zero on every face
    L = np.asarray([1.0, 2.0, 3.0])
    tang = np.sin(np.pi * pts / L)
    mean_t, max_t = analysis.flux_stats(tang, nrm)
    assert max_t < 1e-12
    # while a radial-from-center field has large outward flux
    rad = pts - L / 2.0
    mean_r, _ = analysis.flux_stats(rad, nrm)
    assert mean_r > 0.3
