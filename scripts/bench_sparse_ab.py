"""TPU A/B: sparse cell-list backend vs centered Pallas for the FULL 3D
projection epoch at ring_collide production scale, plus two round-3
evidence items that share the same exclusive-TPU window:

  * 2D headline repeated runs (VERDICT r2 item 7 — variance band);
  * band-guard fallback cost at a 512^3-scale chunk (item 8).

Preempts the production chain via bench.py's machinery and restarts it
afterwards. Writes runs_r2_evidence/sparse_ab.json.

Usage: python scripts/bench_sparse_ab.py [--no-2d] [--no-band]
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def measure_3d(mode, n_epochs=200):
    """Full 3D projection epoch rate under GF_FIELD_BACKEND=mode."""
    import jax
    from gaussian_fluids_tpu.solver import project
    from gaussian_fluids_tpu.utils import rng

    os.environ["GF_FIELD_BACKEND"] = mode
    project._runner_3d.cache_clear()
    run_chunk, carry, mix, spec, src = bench.build_state_3d()
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    c2, ls = run_chunk(carry, key, 100)
    _sync(c2[0]["positions"])
    compile_s = time.perf_counter() - t0
    first_losses = np.asarray(ls)[0].tolist()
    key, sub = rng.split2(key)
    t0 = time.perf_counter()
    c = c2
    for _ in range(n_epochs // 100):
        key, sub = rng.split2(key)
        c, _ = run_chunk(c, sub, 100)
    _sync(c[0]["positions"])
    eps = n_epochs / (time.perf_counter() - t0)
    out = {"mode": mode, "epochs_per_s": round(eps, 2),
           "ms_per_epoch": round(1000.0 / eps, 2),
           "compile_s": round(compile_s, 1),
           "first_epoch_losses": first_losses, "source": src}
    # for sparse: confirm the guard kept the sparse branch
    if mode == "sparse":
        from gaussian_fluids_tpu.ops import sparse
        r = np.random.RandomState(0)
        x = np.sort(r.uniform(0, 1, (8192, 3)).astype(np.float32), axis=0)
        L = sparse.pair_capacity(8192, mix.capacity, spec)
        import jax.numpy as jnp
        used = sparse._sparse_value_jac(mix.params(), mix.alive, spec,
                                        jnp.asarray(x), L, True)[2]
        out["sparse_branch_used"] = bool(used)
        out["pair_capacity"] = L
    project._runner_3d.cache_clear()
    os.environ.pop("GF_FIELD_BACKEND", None)
    return out


def measure_2d_repeats(n=3):
    """VERDICT r2 item 7: the headline with a run-to-run spread."""
    vals = []
    for i in range(n):
        eps, _, _, _ = bench.measure_ours()
        vals.append(round(eps, 2))
        print(f"  2D run {i}: {eps:.2f} eps", flush=True)
    return vals


def measure_band_guard():
    """VERDICT r2 item 8: cost of a band-guard violation at density-chunk
    scale. Times value_banded with an adequate band vs band=1 (forced
    violation -> full masked-sweep fallback) on one 512^3-style chunk."""
    import jax
    import jax.numpy as jnp
    from gaussian_fluids_tpu.ops import field
    from gaussian_fluids_tpu.solver.simulate3d import _suggest_band

    run_chunk, carry, mix, spec, src = bench.build_state_3d()
    del run_chunk, carry
    # build_state_3d Morton-sorts (round 4); the banded x-window kernel
    # needs the x order the density replay uses (mixture.x_sorted)
    mix = mix.x_sorted()
    B = 1 << 19   # one device-resident grid chunk of the 512^3 sweep
    g64 = np.linspace(0, 1, 64, dtype=np.float32)
    g128 = np.linspace(0, 1, 128, dtype=np.float32)
    pts = np.stack(np.meshgrid(g64, g64, g128, indexing="ij"),
                   -1).reshape(-1, 3)
    assert pts.shape[0] == B
    x = jnp.asarray(pts)
    band = _suggest_band(mix, spec, 0.1)

    def timed(bd):
        f = jax.jit(lambda xx: field.value_banded(mix, spec, xx, band=bd,
                                                  presorted=True))
        _sync(f(x))
        t0 = time.perf_counter()
        for _ in range(3):
            _sync(f(x))
        return (time.perf_counter() - t0) / 3

    ok_s = timed(band)
    viol_s = timed(1)     # cannot cover -> runtime guard takes fallback
    return {"chunk": B, "band": int(band), "banded_s": round(ok_s, 4),
            "violation_fallback_s": round(viol_s, 4),
            "fallback_cost_x": round(viol_s / ok_s, 2), "source": src}


def main():
    import jax
    from gaussian_fluids_tpu.cli import _enable_persistent_compile_cache
    _enable_persistent_compile_cache(jax)
    bench._preempt_chain()
    ev_path = os.path.join(HERE, "runs_r2_evidence", "sparse_ab.json")
    res = {}
    if os.path.exists(ev_path) and "--fresh" not in sys.argv:
        with open(ev_path) as fd:   # resume: keep already-measured parts
            res = json.load(fd)
    try:
        print("3D A/B at ring_collide scale:", flush=True)
        if "pallas" not in res:
            res["pallas"] = measure_3d("auto")
        print(f"  pallas/auto: {res['pallas']}", flush=True)
        # --no-sparse: the sparse compile was measured at 29+ min on
        # 2026-08-21 (aborted; see BASELINE.md) — skip it when this run
        # is only after the 2D variance band / band-guard items
        if "--no-sparse" not in sys.argv:
            res["sparse"] = measure_3d("sparse")
            print(f"  sparse:      {res['sparse']}", flush=True)
        if "--no-2d" not in sys.argv and "headline_2d_eps" not in res:
            res["headline_2d_eps"] = measure_2d_repeats()
        if "--no-band" not in sys.argv and "band_guard" not in res:
            res["band_guard"] = measure_band_guard()
            print(f"  band guard: {res['band_guard']}", flush=True)
    finally:
        ev = os.path.join(HERE, "runs_r2_evidence")
        os.makedirs(ev, exist_ok=True)
        with open(os.path.join(ev, "sparse_ab.json"), "w") as fd:
            json.dump(res, fd, indent=1)
        print(json.dumps(res, indent=1), flush=True)
        bench._restart_chain()


if __name__ == "__main__":
    main()
