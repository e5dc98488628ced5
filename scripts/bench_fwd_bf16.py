"""On-chip A/B for GF_FWD_MM_BF16 (bf16 operands in the forward kernels'
thin MXU contractions) at 3D production scale.

VERDICT r5 item 3(a): the 5 RK4 target val+jac sweeps are the largest
remaining slice of the 3D projection epoch (~8-10 ms of 23.2). Their MXU
passes are (TB, TN) @ (TN, 3) with the output dim padded to 128 — pure
issue-rate cost, and f32 passes issue at ~1/6 the bf16 rate. This script
measures, interleaved on the real chip at the pinned bench geometry:

  rate      full projection-epoch rate f32 vs bf16 (alternating rounds)
  accuracy  max/mean relative val+jac error of the bf16 forward against
            the f32 forward on the production checkpoint

Prints JSON lines. Preempts/restarts the production chain the same way
bench.py does (the tunneled TPU is exclusive). The flag is read at trace
time, so each variant rebuilds the runner after clearing the lru caches
(same pattern as bench_cells_ab.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _build(flag):
    if flag:
        os.environ["GF_FWD_MM_BF16"] = "1"
    else:
        os.environ.pop("GF_FWD_MM_BF16", None)
    from gaussian_fluids_tpu.solver import project
    project._runner_2d.cache_clear()
    project._runner_3d.cache_clear()
    import bench
    return bench.build_state_3d()


def _time_chunks(run_chunk, carry, key, rounds, chunk=100):
    import jax
    from gaussian_fluids_tpu.utils import rng
    times = []
    for _ in range(rounds):
        key, sub = rng.split2(key)
        t0 = time.perf_counter()
        carry, _ = run_chunk(carry, sub, chunk)
        float(np.asarray(carry[0]["positions"])[0, 0])  # hard sync
        times.append(time.perf_counter() - t0)
    return carry, key, times


def main():
    import bench
    bench._preempt_chain()
    try:
        import jax
        import jax.numpy as jnp
        from gaussian_fluids_tpu.ops import field, spatial

        # Build AND WARM each variant inside its own env context: the env
        # flag is read at TRACE time, which happens at the first CALL, not
        # at build — warming both after the last _build would trace both
        # under the same flag (the first run of this script did exactly
        # that: speedup 1.001, bit-identical outputs).
        key = jax.random.PRNGKey(0)
        rc_f32, carry_f32, mix, spec, src = _build(False)
        carry_f32, _ = rc_f32(carry_f32, key, 100)
        float(np.asarray(carry_f32[0]["positions"])[0, 0])
        rc_bf16, carry_bf16, _, _, _ = _build(True)
        carry_bf16, _ = rc_bf16(carry_bf16, key, 100)
        float(np.asarray(carry_bf16[0]["positions"])[0, 0])

        # direct target-sweep timing + engagement check: one val+jac
        # forward over the production mixture, traced under each flag
        r = np.random.RandomState(0)
        xq = jnp.asarray(r.uniform(0, 1, (8192, 3)).astype(np.float32))
        xq = xq[jnp.argsort(spatial.sort_key(xq, spec.lo, spec.hi))]

        def _sweep_time(flag):
            if flag:
                os.environ["GF_FWD_MM_BF16"] = "1"
            else:
                os.environ.pop("GF_FWD_MM_BF16", None)
            fn = jax.jit(lambda m, p: field.value_and_jac(
                m, spec, p, presorted=True, need_dx=False))
            v, j = fn(mix, xq)
            float(np.asarray(v)[0, 0])   # warm + drain
            t0 = time.perf_counter()
            for _ in range(20):
                v, j = fn(mix, xq)
            # ONE final fetch drains the serial device queue (the tunnel
            # adds ~25 ms per round trip — per-rep fetches would swamp a
            # ~2 ms sweep)
            s = float(np.asarray(v).sum())
            dt = (time.perf_counter() - t0) / 20
            return dt, np.asarray(v), np.asarray(j), s

        sweep_f32, v32, j32, _ = _sweep_time(False)
        sweep_bf16, vbf, jbf, _ = _sweep_time(True)
        engaged = float(np.abs(vbf - v32).max()) > 0.0
        os.environ.pop("GF_FWD_MM_BF16", None)

        # interleaved rate (3 x 200 epochs each, alternating)
        t_f32, t_bf16 = [], []
        for _ in range(3):
            carry_f32, key, ts = _time_chunks(rc_f32, carry_f32, key, 2)
            t_f32 += ts
            carry_bf16, key, ts = _time_chunks(rc_bf16, carry_bf16, key, 2)
            t_bf16 += ts
        eps_f32 = 100 * len(t_f32) / sum(t_f32)
        eps_bf16 = 100 * len(t_bf16) / sum(t_bf16)

        vs = max(np.abs(v32).max(), 1e-12)
        js = max(np.abs(j32).max(), 1e-12)
        out = {
            "experiment": "fwd_mm_bf16_ab",
            "checkpoint": src,
            "bf16_engaged": engaged,
            "sweep_ms_f32": round(sweep_f32 * 1e3, 3),
            "sweep_ms_bf16": round(sweep_bf16 * 1e3, 3),
            "sweep_speedup": round(sweep_f32 / sweep_bf16, 3),
            "eps_f32": round(eps_f32, 2),
            "eps_bf16": round(eps_bf16, 2),
            "speedup": round(eps_bf16 / eps_f32, 3),
            "val_max_rel_err": float(np.abs(vbf - v32).max() / vs),
            "val_mean_rel_err": float(np.abs(vbf - v32).mean() / vs),
            "jac_max_rel_err": float(np.abs(jbf - j32).max() / js),
            "jac_mean_rel_err": float(np.abs(jbf - j32).mean() / js),
        }
        print(json.dumps(out))
    finally:
        bench._restart_chain()


if __name__ == "__main__":
    main()
