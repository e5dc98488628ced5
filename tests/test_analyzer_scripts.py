"""End-to-end tests for the run-analyzer scripts (scripts/analyze_*.py).

Each test synthesizes a tiny run directory of reference-format
``gaussian_velocity_{n}.pt`` checkpoints and runs the analyzer as a real
subprocess (the way a user does), asserting it reports every frame and
exits cleanly. This covers the load_checkpoint -> eval_on_grid -> probe
glue that unit tests on utils.analysis alone cannot.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.io.checkpoint import save_checkpoint
from gaussian_fluids_tpu.models.mixture import GaussianMixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mixture(lo, hi, n, d, rng):
    spec = FieldSpec.create(lo, hi, n, d=d, vdim=d)
    pts = rng.uniform(np.asarray(lo) + 0.1, np.asarray(hi) - 0.1,
                      size=(n, d)).astype(np.float32)
    mix = GaussianMixture.create(pts, spec)
    p = mix.params()
    vals = rng.normal(0.0, 0.5, size=p["values"].shape).astype(np.float32)
    mix = mix.with_params({**p, "values": vals * np.asarray(mix.alive)[:, None]})
    return mix, spec


def _write_run(tmp_path, lo, hi, n, d, frames):
    rng = np.random.default_rng(0)
    for i in range(frames):
        mix, spec = _mixture(lo, hi, n, d, rng)
        f = os.path.join(tmp_path, f"gaussian_velocity_{i}.pt")
        save_checkpoint(f, mix, spec)
        # distinct mtimes so the wall-clock stats path executes
        os.utime(f, (1.0e9 + 10.0 * i, 1.0e9 + 10.0 * i))
    return tmp_path


def _run(script, *args):
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.slow
def test_analyze_leapfrog2d(tmp_path):
    run = _write_run(str(tmp_path), (-5.2, -4.2), (5.2, 4.2), 24, 2,
                     frames=3)
    out = _run("analyze_leapfrog2d.py", run, "2")
    # frames 0, 2 sampled (stride 2) + last frame
    for tok in ("per-frame wall-clock", "mean|div|"):
        assert tok in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2  # frames 0 and 2


@pytest.mark.slow
def test_analyze_karman2d(tmp_path):
    # karman checkpoints live in the scaled target space; the analyzer
    # probes the scene's visualize domain, so the synthetic field just has
    # to cover it (scaling_factor ~ 10/6 on the 25x6 domain).
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("karman")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.visualize_domain) * sf
    run = _write_run(str(tmp_path), (x0 - 1, y0 - 1), (x1 + 1, y1 + 1),
                     24, 2, frames=3)
    out = _run("analyze_karman2d.py", run, "2")
    assert "street alternations" in out
    assert "shedding" in out  # either the estimate or the no-shedding line
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


@pytest.mark.slow
def test_analyze_ring3d(tmp_path):
    run = _write_run(str(tmp_path), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                     16, 3, frames=2)
    out = _run("analyze_ring3d.py", run, "1", "8")
    assert "r_ring" in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


def test_analyze_rc_tg128_ab(tmp_path):
    """The cached-target A/B analyzer: identical runs must PASS with
    ratio 1.0; a clearly worse cached run must FAIL."""
    a = os.path.join(str(tmp_path), "exact")
    b = os.path.join(str(tmp_path), "cached")
    os.makedirs(a)
    os.makedirs(b)
    rng = np.random.default_rng(0)
    for i in range(3):
        mix, spec = _mixture((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 16, 3, rng)
        for d in (a, b):
            save_checkpoint(os.path.join(d, f"gaussian_velocity_{i}.pt"),
                            mix, spec)
    out = _run("analyze_rc_tg128_ab.py", a, b, "1", "8")
    assert "VERDICT: PASS" in out
    # corrupt the cached run's last frame -> morphology drifts -> FAIL
    mix, spec = _mixture((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 16, 3,
                         np.random.default_rng(99))
    p = mix.params()
    mix = mix.with_params({**p, "values": p["values"] * 40.0})
    save_checkpoint(os.path.join(b, "gaussian_velocity_2.pt"), mix, spec)
    out = _run("analyze_rc_tg128_ab.py", a, b, "1", "8")
    assert "VERDICT: FAIL" in out


@pytest.mark.slow
def test_analyze_taylor_green2d(tmp_path):
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("taylor_green")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.visualize_domain)
    run = _write_run(str(tmp_path), (x0 * sf - 1, y0 * sf - 1),
                     (x1 * sf + 1, y1 * sf + 1), 24, 2, frames=3)
    out = _run("analyze_taylor_green2d.py", run, "2")
    assert "relL1(u)" in out and "analytic mean|u|" in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


@pytest.mark.slow
def test_analyze_vortices_pass2d(tmp_path):
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("vortices_pass")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.visualize_domain)
    run = _write_run(str(tmp_path), (x0 * sf - 1, y0 * sf - 1),
                     (x1 * sf + 1, y1 * sf + 1), 24, 2, frames=3)
    out = _run("analyze_vortices_pass2d.py", run, "vortices_pass", "2")
    assert "obstacles=2" in out and "flux0" in out and "flux1" in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


@pytest.mark.slow
def test_analyze_vortices_pass2d_noslip_verdict(tmp_path):
    """The no-slip variant must report tangential-slip columns on top of
    the flux columns, plus the explicit obstacle-constraint verdict line
    (a random synthetic field is nowhere near u=0 on the circles, so the
    verdict must come out WEAK, not PASS)."""
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("vortices_pass_noslip")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.visualize_domain)
    run = _write_run(str(tmp_path), (x0 * sf - 1, y0 * sf - 1),
                     (x1 * sf + 1, y1 * sf + 1), 24, 2, frames=3)
    out = _run("analyze_vortices_pass2d.py", run, "vortices_pass_noslip",
               "2")
    assert "slip0" in out and "slip1" in out
    assert "VERDICT obstacle constraint: WEAK" in out
    assert "tangential slip" in out


@pytest.mark.slow
def test_analyze_taylor_vortex2d(tmp_path):
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("taylor_vortex")
    sf = scene.scaling_factor
    (x0, x1, y0, y1) = np.asarray(scene.visualize_domain)
    run = _write_run(str(tmp_path), (x0 * sf - 1, y0 * sf - 1),
                     (x1 * sf + 1, y1 * sf + 1), 24, 2, frames=3)
    out = _run("analyze_taylor_vortex2d.py", run, "2")
    assert "sep" in out and "angle" in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


@pytest.mark.slow
def test_analyze_ring3d_mesh_flux(tmp_path):
    run = _write_run(str(tmp_path), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                     16, 3, frames=2)
    out = _run("analyze_ring3d.py", run, "1", "8", "ring_with_obstacle")
    assert "meshflux" in out
    rows = [l for l in out.splitlines()
            if l and not l.startswith("#") and l.lstrip()[0].isdigit()]
    assert len(rows) == 2


@pytest.mark.slow
def test_analyze_density3d(tmp_path):
    """Synthesize a 2-frame, 2-tag .vti smoke sequence (a translated blob:
    max preserved, mass identical) and check the analyzer reports every
    frame and passes the convexity invariants."""
    from gaussian_fluids_tpu.io.vti import write_vti_array
    n = 10  # centers chosen on grid nodes so the sampled max is identical
    g = np.arange(n) / n
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")

    def blob(cx):
        return np.exp(-(((X - cx) ** 2 + (Y - .5) ** 2 + (Z - .5) ** 2)
                        / 0.02)).astype(np.float32)

    for tag, c0, c1 in (("a", 0.3, 0.4), ("b", 0.7, 0.6)):
        for i, c in enumerate((c0, c1)):
            write_vti_array(blob(c), (0, 0, 0), (1 / n,) * 3,
                            os.path.join(tmp_path, f"density_{tag}_{i}.vti"))
    out = _run("analyze_density3d.py", str(tmp_path))
    assert "invariants OK" in out
    assert out.count("== density") == 2


@pytest.mark.slow
def test_analyze_density3d_flags_growing_max(tmp_path):
    """A frame whose max grows (impossible under trilinear backtrace)
    must fail the invariant gate with a nonzero exit."""
    from gaussian_fluids_tpu.io.vti import write_vti_array
    n = 8
    V = np.zeros((n, n, n), np.float32)
    V[4, 4, 4] = 1.0
    write_vti_array(V, (0, 0, 0), (1 / n,) * 3,
                    os.path.join(tmp_path, "density_a_0.vti"))
    write_vti_array(2.0 * V, (0, 0, 0), (1 / n,) * 3,
                    os.path.join(tmp_path, "density_a_1.vti"))
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "analyze_density3d.py"),
         str(tmp_path)], capture_output=True, text=True, timeout=300,
        env=env)
    assert r.returncode == 1
    assert "max grew" in r.stdout


@pytest.mark.slow
def test_report_runs(tmp_path):
    """report_runs aggregates frame count, N growth and mtime wall stats
    from a synthesized run directory."""
    run = _write_run(str(tmp_path), (-1.0, -1.0), (1.0, 1.0), 24, 2,
                     frames=4)
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "report_runs.py"),
         run], capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frames 0..3 (4 ckpts)" in r.stdout
    assert "median 10.0 s" in r.stdout  # _write_run spaces mtimes 10 s
