"""CLI entry points — same flag surface as the reference
(``--device --dir --start_frame --init_cond --dt --last_time [--boundary]``,
reference 2D/GSR.py:13-23, 3D/GSR.py:12-23) without import-time side
effects. ``--device`` selects the JAX platform ('tpu'/'cpu'/index kept for
compatibility); extra flags control epoch budgets for smoke runs.
"""

from __future__ import annotations

import argparse


def _common(parser: argparse.ArgumentParser, dim: int):
    parser.add_argument("--device", type=str, default="0",
                        help="'cpu' forces CPU; anything else keeps the "
                             "default accelerator (reference: CUDA index)")
    parser.add_argument("--dir", type=str,
                        default="output_fast" if dim == 2 else "output_3d")
    parser.add_argument("--start_frame", type=int, default=0)
    parser.add_argument("--init_cond", type=str,
                        default="taylor_vortex" if dim == 2 else "leapfrog")
    parser.add_argument("--dt", type=float, default=0.01 if dim == 2 else 0.02)
    parser.add_argument("--last_time", type=float,
                        default=10.0 if dim == 2 else 100.0)
    if dim == 3:
        parser.add_argument("--boundary", type=float, default=10.0)
        parser.add_argument("--density_res_multiplier", type=int, default=4,
                            help="density grid = visualize_res * this "
                                 "(reference 3D/advance_density.py:3-7 "
                                 "uses 4 -> 512^3)")
    parser.add_argument("--target_grid", type=int, default=0,
                        help="cached covector-target grid resolution "
                             "(0 = exact per-epoch RK4 targets, the "
                             "reference behavior; >0 trades target "
                             "accuracy for a much cheaper epoch)")
    parser.add_argument("--max_epoch", type=int, default=None,
                        help="override the per-phase epoch budget")
    parser.add_argument("--mesh", type=str, default=None, metavar="BxG",
                        help="run the frame loop multi-chip over a "
                             "(batch=B) x (gauss=G) jax.sharding.Mesh of "
                             "the first B*G local devices (e.g. '4x2'; a "
                             "bare integer means batch-only). The sharded "
                             "epochs use exact per-epoch targets, so "
                             "--target_grid must stay 0. Reference analog: "
                             "its whole device story was the --device flag "
                             "(2D/GSR.py:26-30); multi-chip is new scope "
                             "(SURVEY.md §2.8)")
    parser.add_argument("--no_viz", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the run "
                             "into DIR (TensorBoard/Perfetto format; "
                             "capture stops after GF_PROFILE_SECONDS, "
                             "default 300, so long runs stay tractable); "
                             "the reference's only instrumentation is "
                             "printed wall-clock deltas (SURVEY.md §5)")
    return parser


def parse_mesh(s):
    """'BxG' or 'B' -> (n_batch, n_gauss); None/'' -> None."""
    if not s:
        return None
    parts = s.lower().split("x")
    if len(parts) > 2 or not all(p.isdigit() and int(p) > 0 for p in parts):
        raise SystemExit(f"--mesh expects 'BxG' or 'B' with positive "
                         f"integers, got {s!r}")
    b = int(parts[0])
    g = int(parts[1]) if len(parts) == 2 else 1
    return (b, g)


def parse_args_2d(argv=None, default_max_epoch=20000):
    p = _common(argparse.ArgumentParser(), dim=2)
    args = p.parse_args(argv)
    if args.max_epoch is None:
        args.max_epoch = default_max_epoch
    args.mesh = parse_mesh(args.mesh)
    _apply_device(args.device)
    return args


def parse_args_3d(argv=None, default_max_epoch=20000):
    p = _common(argparse.ArgumentParser(), dim=3)
    args = p.parse_args(argv)
    if args.max_epoch is None:
        args.max_epoch = default_max_epoch
    args.mesh = parse_mesh(args.mesh)
    _apply_device(args.device)
    return args


def _apply_device(device: str):
    """Honor the reference's --device semantics (2D/GSR.py:26-30: pick ONE
    device by index via CUDA_VISIBLE_DEVICES). 'cpu' forces the CPU
    platform; a nonzero index K selects jax.local_devices()[K] as the
    default device on multi-device hosts (K=0 keeps the default without
    initializing the backend early)."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif device.isdigit() and int(device) > 0:
        k = int(device)
        devs = jax.local_devices()
        if k < len(devs):
            jax.config.update("jax_default_device", devs[k])
        else:
            print(f"[cli] --device {k} ignored: only {len(devs)} local "
                  f"device(s) visible")
    _enable_persistent_compile_cache(jax)


def _enable_persistent_compile_cache(jax):
    """Persist compiled executables across processes.

    The solver runs as separate ``initialize`` / ``advance`` processes (same
    split as the reference's initialize.py / advance.py), and on TPU each
    fresh process would otherwise re-pay every XLA compile (~20-40 s each on
    this class of hardware). The cache makes resume (``--start_frame``) and
    repeat runs start in seconds.
    """
    import os

    if jax.config.jax_compilation_cache_dir:
        return
    cache = os.environ.get(
        "GF_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "gaussian_fluids_tpu", "jax_cache", _host_key()))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block the run on it


def _host_key() -> str:
    """Per-host cache subdirectory: XLA:CPU persists AOT executables keyed
    only by program, so an entry compiled on a host with different CPU
    features SIGILLs when loaded on this one (observed across container
    migrations). Hash the feature flags into the cache path."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine() or "default"
