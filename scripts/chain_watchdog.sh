#!/bin/bash
# Stall watchdog for the production chain. The tunneled TPU client can
# wedge indefinitely mid-fetch (observed 2026-08-21: advance3d silent for
# 25+ min inside a frame's .vti grid evaluation while frames normally
# complete in ~4; the socket stayed ESTABLISHED, zero bytes moved). A
# wedged client never exits on its own, so an unattended overnight chain
# would otherwise lose the rest of its horizon.
#
# Every POLL seconds: if a chain is running but NOTHING chain-related has
# progressed for STALL seconds (chain log, per-config logs, any output_*
# artifact), kill the chain (script first so it cannot advance to the
# next config, then its children — by recorded pid only, never by
# pattern) and relaunch it; every step auto-resumes from its last
# checkpoint. STALL must comfortably exceed the longest legitimate
# silence: cold XLA compiles took ~14 min on 2026-08-20, so 25 min.
# Usage: nohup bash scripts/chain_watchdog.sh & echo $! > /tmp/chain_watchdog.pid
set -u
cd "$(dirname "$0")/.."
POLL=${POLL:-120}
STALL=${STALL:-1500}
LOGDIR=${LOGDIR:-runs_r2}

newest_activity() {
  # newest mtime (epoch s) across chain logs and run outputs
  { find "$LOGDIR" -maxdepth 1 -type f -printf '%T@\n' 2>/dev/null
    find output_* -maxdepth 1 -type f -printf '%T@\n' 2>/dev/null
  } | sort -rn | head -1 | cut -d. -f1
}

while true; do
  sleep "$POLL"
  [ -f /tmp/chain.pid ] || continue
  pid=$(cat /tmp/chain.pid 2>/dev/null) || continue
  if ! [ -d "/proc/$pid" ]; then continue; fi
  # verify the pid is actually our chain script, not a recycled pid
  if ! grep -qa run_production_chain "/proc/$pid/cmdline" 2>/dev/null; then
    continue
  fi
  last=$(newest_activity)
  [ -n "$last" ] || continue
  now=$(date +%s)
  age=$((now - last))
  if [ "$age" -lt "$STALL" ]; then continue; fi

  echo "[watchdog] chain stalled ${age}s (pid $pid) — restarting" \
    | tee -a "$LOGDIR/chain.log"
  # The chain runs in its own process group (setsid at launch, below), so
  # killing the NEGATIVE pid takes the whole tree atomically — including
  # children reparented to init after the parent died, which a
  # descendant-walk snapshot would miss (those escapees are the likely
  # cause of the 2026-08-21 08:06-08:26 tv_advance thrash: 8 attempts
  # died at startup with no output while something still held the TPU).
  # Fallback to the pid itself for a chain launched pre-setsid.
  kill -TERM -- "-$pid" 2>/dev/null || kill -TERM "$pid" 2>/dev/null
  for i in $(seq 1 45); do
    # a process group with any member alive answers signal 0
    kill -0 -- "-$pid" 2>/dev/null || break
    sleep 2
  done
  kill -9 -- "-$pid" 2>/dev/null
  # give the tunnel a moment to drop the dead client's device hold
  sleep 60
  setsid nohup bash scripts/run_production_chain5.sh >> runs_r2_nohup.log 2>&1 &
  echo $! > /tmp/chain.pid
  echo "[watchdog] chain relaunched (pid $(cat /tmp/chain.pid))" \
    | tee -a "$LOGDIR/chain.log"
done
