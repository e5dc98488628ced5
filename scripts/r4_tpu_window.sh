#!/bin/bash
# Round-4 TPU measurement window: preempt the production chain ONCE, run
# every queued measurement sequentially, restart the chain ONCE at the end.
#   1. cells-backend mask stats (tile density / work totals per tiling)
#   2. cells vs centered epoch A/B sweep (the round's headline experiment)
#   3. STATUS_R3 partials: 3-run 2D headline band + 512^3 band-guard cost
#   4. 2D epoch component breakdown (plans the 2D latency work)
# Each step logs under runs_r2_evidence/r4_window/. All steps are safe to
# re-run; the chain resumes from its checkpoints afterwards.
set -u
cd "$(dirname "$0")/.."
L=runs_r2_evidence/r4_window
mkdir -p "$L"

python - <<'EOF'
import bench
bench._preempt_chain()
EOF

echo "=== masks $(date -u +%H:%M:%S)"
timeout 1200 python -u scripts/bench_cells_ab.py masks \
  > "$L/masks.jsonl" 2> "$L/masks.err"

echo "=== sweep $(date -u +%H:%M:%S)"
timeout 7200 python -u scripts/bench_cells_ab.py sweep --no-chain \
  --tbs 16 32 64 --tns 128 256 --cap "${SWEEP_CAP:-0.12}" \
  > "$L/sweep.jsonl" 2> "$L/sweep.err"

echo "=== sparse_ab partials $(date -u +%H:%M:%S)"
timeout 3600 python -u - > "$L/sparse_partials.log" 2>&1 <<'EOF'
import importlib.util
import json
import os
spec = importlib.util.spec_from_file_location(
    "sab", os.path.join("scripts", "bench_sparse_ab.py"))
sab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sab)
ev = os.path.join("runs_r2_evidence", "sparse_ab.json")
res = json.load(open(ev))
if "headline_2d_eps" not in res:
    res["headline_2d_eps"] = sab.measure_2d_repeats()
    print("2d band:", res["headline_2d_eps"], flush=True)
if "band_guard" not in res:
    res["band_guard"] = sab.measure_band_guard()
    print("band_guard:", res["band_guard"], flush=True)
json.dump(res, open(ev, "w"), indent=1)
EOF

echo "=== 2d breakdown $(date -u +%H:%M:%S)"
timeout 2400 python -u scripts/bench_epoch_breakdown.py \
  > "$L/breakdown2d.txt" 2>&1

echo "=== restart chain $(date -u +%H:%M:%S)"
# _restart_chain relaunches only what THIS process preempted (_PREEMPTED
# is in-memory), so force both tags from a fresh process
python - <<'EOF'
import bench
bench._PREEMPTED.extend(["run_production_chain", "evidence_watcher"])
bench._restart_chain()
EOF
echo "=== window done $(date -u +%H:%M:%S)"
