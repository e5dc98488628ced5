"""On-chip A/B for the work-list (cells) backend vs the centered masked
sweep at 3D production scale (ring_collide, N=64,000, B=8,192).

Round-4 decision experiment (VERDICT r3 item 1): Morton-sorted fine tiles
+ flat work lists should close most of the 42-70x pair waste of the
x-sorted 256x512 tile mask. This script measures, on the real chip and
the most recent production checkpoint:

  masks   host-side tile-mask density + work-list totals over a
          (tb, tn) grid — predicts pair counts and sizes GF_CELLS_CAP
          without touching the kernels.
  epoch   full projection-epoch rate (the headline measurement) for a
          given backend/tiling, interleaved A/B like bench.py.
  sweep   epoch A/B across tilings, JSON lines to stdout.

Run from the repo root. Preempts/restarts the production chain the same
way bench.py does (the tunneled TPU is exclusive).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _build(env):
    """(Re)build the 3D projection runner under the given env (dispatch
    decisions are read at trace time). The runners are lru_cached per
    static config — clear them or every config would silently reuse the
    FIRST config's traced program (observed: seven identical 19.2-eps
    rows on 2026-08-21)."""
    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    from gaussian_fluids_tpu.solver import project
    project._runner_2d.cache_clear()
    project._runner_3d.cache_clear()
    import bench
    return bench.build_state_3d()


def cmd_masks(args):
    import jax.numpy as jnp
    import numpy as np
    import bench
    from gaussian_fluids_tpu.ops import field, spatial

    _, _, mix, spec, src = bench.build_state_3d()
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(0, 1, (args.batch, 3)).astype(np.float32))
    x = x[jnp.argsort(spatial.sort_key(x, spec.lo, spec.hi))]
    out = []
    for tb in (8, 16, 32, 64, 128, 256):
        for tn in (128, 256, 512):
            x_p, _, _, _, _, _, tmask = field._centered_prep(
                mix, spec, x, tb, tn, presorted=True)
            m = np.asarray(tmask) != 0
            nbt, nnt = m.shape
            density = float(m.mean())
            pairs = density * m.size * tb * tn
            row_cnt = m.sum(1)
            col_cnt = m.sum(0)
            total_f = int(np.maximum(row_cnt, 1).sum())
            total_b = int(np.maximum(col_cnt, 1).sum())
            rec = dict(src=src, tb=tb, tn=tn, nbt=nbt, nnt=nnt,
                       density=round(density, 4), pairs=int(pairs),
                       work_fwd=total_f, work_bwd=total_b,
                       cap_frac_needed=round(
                           max(total_f, total_b) / m.size, 4),
                       row_max=int(row_cnt.max()),
                       col_max=int(col_cnt.max()))
            out.append(rec)
            print(json.dumps(rec), flush=True)
    return out


def _time_chunks(run_chunk, carry, key, n_chunks=3, chunk=100):
    import jax
    from gaussian_fluids_tpu.utils import rng
    carry, _ = run_chunk(carry, key, chunk)          # compile + warm
    jax.block_until_ready(carry[0]["positions"])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, sub = rng.split2(key)
        carry, _ = run_chunk(carry, sub, chunk)
    jax.block_until_ready(carry[0]["positions"])
    return n_chunks * chunk / (time.perf_counter() - t0)


def cmd_epoch(args):
    import jax
    env = {"GF_FIELD_BACKEND": args.backend if args.backend != "auto"
           else None,
           "GF_CELLS_TB": args.tb, "GF_CELLS_TN": args.tn,
           "GF_CELLS_CAP": args.cap,
           "GF_CELLS": "0" if args.backend == "pallas" else "1"}
    run_chunk, carry, mix, spec, src = _build(env)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    eps = _time_chunks(run_chunk, carry, key, args.chunks)
    rec = dict(backend=args.backend, tb=args.tb, tn=args.tn, cap=args.cap,
               src=src, eps=round(eps, 2),
               ms_per_epoch=round(1000.0 / eps, 3),
               wall_incl_compile=round(time.perf_counter() - t0, 1))
    print(json.dumps(rec), flush=True)
    return rec


def cmd_sweep(args):
    import jax
    from gaussian_fluids_tpu.utils import rng
    results = []
    # baseline first: the centered masked sweep at its tuned 256x512
    configs = [("pallas", 256, 512, "0.12")]
    for tb in args.tbs:
        for tn in args.tns:
            configs.append(("cells", tb, tn, args.cap))
    for backend, tb, tn, cap in configs:
        env = {"GF_FIELD_BACKEND": None,
               "GF_CELLS_TB": tb, "GF_CELLS_TN": tn, "GF_CELLS_CAP": cap,
               "GF_CELLS": "0" if backend == "pallas" else "1"}
        try:
            run_chunk, carry, mix, spec, src = _build(env)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            eps = _time_chunks(run_chunk, carry, key, args.chunks)
            rec = dict(backend=backend, tb=tb, tn=tn, cap=cap, src=src,
                       eps=round(eps, 2),
                       ms_per_epoch=round(1000.0 / eps, 3),
                       wall_incl_compile=round(time.perf_counter() - t0, 1))
        except Exception as e:  # record and keep sweeping
            rec = dict(backend=backend, tb=tb, tn=tn, cap=cap,
                       error=repr(e)[:300])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("masks")
    m.add_argument("--batch", type=int, default=8192)
    e = sub.add_parser("epoch")
    e.add_argument("--backend", default="cells",
                   choices=["cells", "pallas", "auto"])
    e.add_argument("--tb", type=int, default=32)
    e.add_argument("--tn", type=int, default=256)
    e.add_argument("--cap", default="0.12")
    e.add_argument("--chunks", type=int, default=3)
    s = sub.add_parser("sweep")
    s.add_argument("--tbs", type=int, nargs="+", default=[16, 32, 64])
    s.add_argument("--tns", type=int, nargs="+", default=[128, 256])
    s.add_argument("--cap", default="0.12")
    s.add_argument("--chunks", type=int, default=3)
    s.add_argument("--no-chain", action="store_true",
                   help="do not preempt/restart the production chain")
    args = ap.parse_args()

    manage = args.cmd in ("epoch", "sweep") and not getattr(
        args, "no_chain", False)
    if manage:
        import bench
        bench._preempt_chain()
    try:
        {"masks": cmd_masks, "epoch": cmd_epoch,
         "sweep": cmd_sweep}[args.cmd](args)
    finally:
        if manage:
            import bench
            bench._restart_chain()


if __name__ == "__main__":
    main()
