#!/bin/bash
# Periodically snapshot + commit production-run evidence while the chain
# runs (see snapshot_runs.sh for why: the host has restarted mid-round
# twice, wiping every gitignored run artifact). Runs until killed.
# Usage: nohup bash scripts/evidence_watcher.sh & echo $! > /tmp/watcher.pid
set -u
cd "$(dirname "$0")/.."
INTERVAL=${INTERVAL:-1500}
while true; do
  sleep "$INTERVAL"
  bash scripts/snapshot_runs.sh "periodic (watcher)" || true
done
