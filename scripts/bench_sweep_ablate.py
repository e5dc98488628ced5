"""Ablate the 3D forward target sweep: where do its ~2.7 ms go?

VERDICT r5 item 3(a) follow-up after the bf16 negative (the MXU passes
already run single-pass bf16 at default precision — gsr_centered._mm_fwd):
the remaining candidates for the 5 RK4 target sweeps' cost are

  prep     _cells_prep — tile mask + flat work-list compaction
           (argsort/cumsum/searchsorted at ~5-15k elements)
  kernel   the work-list Pallas forward itself (VPU elementwise + exp +
           thin MXU passes)
  chain    the full production target evaluation
           (covector_targets_3d_from: 5 sweeps + RK4 tangent chain +
           linalg.solve)

Measured on the pinned production checkpoint, one drain fetch per timed
loop (the tunnel adds ~25 ms per round trip). Prints one JSON line.
Preempts/restarts the chain like bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _timed(fn, args, fetch, reps=20):
    out = fn(*args)
    fetch(out)  # warm + drain
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    import bench
    bench._preempt_chain()
    try:
        import jax
        import jax.numpy as jnp
        from gaussian_fluids_tpu.ops import field, spatial
        from gaussian_fluids_tpu.solver.covector import advected_vorticity_3d

        _, _, mix, spec, src = bench.build_state_3d()
        tb, tn = field._cells_tiles(3)
        r = np.random.RandomState(0)
        xq = jnp.asarray(r.uniform(0, 1, (8192, 3)).astype(np.float32))
        xq = xq[jnp.argsort(spatial.sort_key(xq, spec.lo, spec.hi))]

        prep = jax.jit(lambda m, x: field._cells_prep(m, spec, x, tb, tn))
        t_prep = _timed(prep, (mix, xq),
                        lambda o: float(np.asarray(o[4])[0]))

        # kernel-only: work lists precomputed once, out of the timed loop
        pre = prep(mix, xq)
        x_p, b, tmask_c, rows, cols, gtiles, qtiles, ok = pre

        def kern(m, x_p, tmask_c, rows, cols, gtiles, qtiles, ok):
            mu_p, pp_p, v_p = field._padded_param_rows(m, spec, tn)
            return field._cells_core(
                ok, tmask_c, rows, cols, gtiles, qtiles, x_p,
                mu_p.T, pp_p.T, v_p, 3, 3, float(spec.clamp_threshold),
                tb, tn, 3)
        kern_j = jax.jit(kern)
        t_kern = _timed(kern_j, (mix, x_p, tmask_c, rows, cols, gtiles,
                                 qtiles, ok),
                        lambda o: float(np.asarray(o)[0, 0]))

        sweep = jax.jit(lambda m, x: field.value_and_jac(
            m, spec, x, presorted=True, need_dx=False))
        t_sweep = _timed(sweep, (mix, xq),
                         lambda o: float(np.asarray(o[0])[0, 0]))

        chain = jax.jit(lambda m, x: advected_vorticity_3d(
            m, spec, x, 0.1, presorted=True))
        t_chain = _timed(chain, (mix, xq),
                         lambda o: float(np.asarray(o[0])[0, 0]), reps=10)

        print(json.dumps({
            "experiment": "sweep_ablate_3d", "checkpoint": src,
            "prep_ms": round(t_prep * 1e3, 3),
            "kernel_ms": round(t_kern * 1e3, 3),
            "sweep_ms": round(t_sweep * 1e3, 3),
            "target_chain_ms": round(t_chain * 1e3, 3),
            "chain_minus_5sweeps_ms": round(
                (t_chain - 5 * t_sweep) * 1e3, 3),
        }))
    finally:
        bench._restart_chain()


if __name__ == "__main__":
    main()
