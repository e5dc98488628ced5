"""Multi-chip scaling SHAPE + communication-volume audit on the virtual
8-device CPU mesh (VERDICT r2 item 4).

No real multi-chip hardware exists in this environment, so absolute CPU
times are meaningless — but two things measured here are real properties
of the compiled program, independent of the host backend:

  * the scaling TREND of epochs/s across mesh shapes at fixed GLOBAL
    batch (does the program parallelize, and along which axis);
  * the collectives the partitioner inserts per epoch — op count and
    bytes moved (all-reduce/all-gather/... parsed from the optimized
    HLO of one-epoch chunks), which is exactly what would ride the ICI
    on a real slice.

Workloads: the 2D projection epoch at leapfrog production scale
(N=5,041 -> padded bucket, global batch 512, reference 2D/advance.py:187)
and the 3D projection epoch (N=8,192 subset of ring_collide's 64,000 so
the CPU sweep stays tractable, global batch 2,048; reference
3D/advance.py:182).

Usage: python scripts/bench_mesh_scaling.py [--quick]
Writes runs_r2_evidence/mesh_scaling.json + a markdown table to stdout.
"""

import json
import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gaussian_fluids_tpu import FieldSpec, GaussianMixture  # noqa: E402
from gaussian_fluids_tpu.parallel import driver, sharding  # noqa: E402
from gaussian_fluids_tpu.solver import optim  # noqa: E402
from gaussian_fluids_tpu.solver.project import ProjectWeights  # noqa: E402

QUICK = "--quick" in sys.argv
SHAPES = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4), (1, 8)]

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def audit_collectives(hlo_text):
    """(per-op counts, total bytes) of collective results in optimized
    HLO. Bytes = size of each collective's result shape (the data that
    must cross the mesh axis at least once)."""
    counts = {c: 0 for c in _COLLECTIVES}
    total_bytes = 0
    # e.g.  %all-reduce.3 = f32[5120,2]{1,0} all-reduce(...)
    pat = re.compile(
        r"=\s*(?:\()?([a-z0-9]+)\[([0-9,]*)\][^ ]*\s+("
        + "|".join(_COLLECTIVES) + r")\(")
    for m in pat.finditer(hlo_text):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        counts[op] += 1
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total_bytes += n * _DTYPE_BYTES.get(dtype, 4)
    return counts, total_bytes


def build_2d(mesh, batch_global):
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = np.asarray(scene.advance_domain, np.float32)
    lo = np.asarray([adv[0], adv[2]]) * sf
    hi = np.asarray([adv[1], adv[3]]) * sf
    n = 5041
    spec = FieldSpec.create(tuple(lo), tuple(hi), n, d=2, vdim=2)
    r = np.random.RandomState(0)
    mk = lambda s: GaussianMixture.create(
        np.random.RandomState(s).uniform(lo * 0.9, hi * 0.9, (n, 2)), spec)
    mix, old = mk(1), mk(2)
    run_chunk, place = driver.make_sharded_project_chunk_2d(
        spec, mesh, "leapfrog", 1.0, ProjectWeights(),
        batch_size=batch_global)
    opt = optim.init(mix.params(), {k: 1e-4 for k in mix.params()},
                     patience=50)
    carry = place(mix.params(), opt, mix.alive,
                  jax.lax.stop_gradient(mix.positions), old.params(),
                  old.alive, scene.advance_domain, 0.025)
    return run_chunk, carry


def build_3d(mesh, batch_global):
    n = 8192
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mk = lambda s: GaussianMixture.create(
        np.random.RandomState(s).uniform(0.1, 0.9, (n, 3)), spec)
    mix, old = mk(3), mk(4)
    run_chunk, place = driver.make_sharded_project_chunk_3d(
        spec, mesh, "ring_collide", (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
        10.0, ProjectWeights(delta_pos=0.0), batch_size=batch_global)
    opt = optim.init(mix.params(), {k: 3e-4 for k in mix.params()},
                     patience=50)
    carry = place(mix.params(), opt, mix.alive, old.params(), old.alive,
                  0.1)
    return run_chunk, carry


def measure(builder, batch_global, n_epochs, reps):
    rows = []
    for (nb, ng) in SHAPES:
        if batch_global % nb:
            continue
        mesh = sharding.make_mesh(nb, ng)
        run_chunk, carry = builder(mesh, batch_global)
        key = jax.random.PRNGKey(7)
        # communication audit on a one-epoch program
        lowered = run_chunk.lower(carry, key, 1)
        counts, nbytes = audit_collectives(lowered.compile().as_text())
        # timing: scan chunk of n_epochs
        c2, _ = run_chunk(carry, key, n_epochs)   # compile + warm
        jax.block_until_ready(c2[0]["positions"])
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            c2, _ = run_chunk(carry, key, n_epochs)
            jax.block_until_ready(c2[0]["positions"])
            best = min(best, time.perf_counter() - t0)
        eps = n_epochs / best
        rows.append({"mesh": f"{nb}x{ng}", "batch_axis": nb,
                     "gauss_axis": ng, "epochs_per_s": round(eps, 2),
                     "collectives_per_epoch":
                         {k: v for k, v in counts.items() if v},
                     "collective_bytes_per_epoch": nbytes})
        print(f"  {nb}x{ng}: {eps:8.2f} eps, "
              f"{sum(counts.values())} collectives/epoch, "
              f"{nbytes/1024:.1f} KiB/epoch", flush=True)
    return rows


def main():
    n2, r2 = (10, 2) if QUICK else (30, 3)
    n3, r3 = (5, 2) if QUICK else (10, 3)
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    print("2D projection epoch, leapfrog scale (N=5041, B=512 global):")
    res2 = measure(build_2d, 512, n2, r2)
    print("3D projection epoch (N=8192, B=2048 global):")
    res3 = measure(build_3d, 2048, n3, r3)
    out = {"workload_2d": res2, "workload_3d": res3,
           "note": "CPU virtual mesh: trends + compiled collectives are "
                   "real, absolute times are not"}
    ev = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs_r2_evidence")
    os.makedirs(ev, exist_ok=True)
    with open(os.path.join(ev, "mesh_scaling.json"), "w") as fd:
        json.dump(out, fd, indent=1)
    # markdown table for BASELINE.md
    for tag, rows in (("2D", res2), ("3D", res3)):
        print(f"\n| mesh (dpxtp) | {tag} eps | vs 1x1 | collectives/epoch "
              "| KiB/epoch |")
        print("|---|---|---|---|---|")
        base = rows[0]["epochs_per_s"]
        for r in rows:
            tot = sum(r["collectives_per_epoch"].values())
            print(f"| {r['mesh']} | {r['epochs_per_s']} | "
                  f"{r['epochs_per_s']/base:.2f}x | {tot} | "
                  f"{r['collective_bytes_per_epoch']/1024:.1f} |")


if __name__ == "__main__":
    main()
