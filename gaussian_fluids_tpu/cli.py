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


def parse_args_2d(argv=None, default_max_epoch=20000):
    p = _common(argparse.ArgumentParser(), dim=2)
    args = p.parse_args(argv)
    if args.max_epoch is None:
        args.max_epoch = default_max_epoch
    _apply_device(args.device)
    return args


def parse_args_3d(argv=None, default_max_epoch=20000):
    p = _common(argparse.ArgumentParser(), dim=3)
    args = p.parse_args(argv)
    if args.max_epoch is None:
        args.max_epoch = default_max_epoch
    _apply_device(args.device)
    return args


def _apply_device(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
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
                     "gaussian_fluids_tpu", "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block the run on it
