#!/bin/bash
# Restore wiped production-run state from the TRACKED evidence snapshots
# (the inverse of snapshot_runs.sh's checkpoint capture). The host has
# restarted and wiped output_*/ + runs_r2/ three times this build; the
# committed checkpoints in runs_r2_evidence/ckpts/ let the chain resume a
# config from its last committed frame instead of re-running it.
#
# Also re-creates runs_r2/*.done markers from done_markers.txt so the
# chain skips completed configs — but ONLY when the marker's artifacts
# are actually restorable: *_init.done requires gaussian_velocity_0.pt in
# the config's output dir (the advance step would crash without it);
# *_advance.done / *_density.done are trusted because their
# completion-time analyzer verdicts are already committed.
set -u
cd "$(dirname "$0")/.."
EV=runs_r2_evidence
LOGDIR=${LOGDIR:-runs_r2}
mkdir -p "$LOGDIR"

if [ -d "$EV/ckpts" ]; then
  for ck in "$EV"/ckpts/*/; do
    [ -d "$ck" ] || continue
    d=$(basename "$ck")
    mkdir -p "$d"
    n=0
    for f in "$ck"gaussian_velocity_*.pt; do
      [ -e "$f" ] || continue
      if [ ! -e "$d/$(basename "$f")" ]; then
        cp -p "$f" "$d/" && n=$((n + 1))
      fi
    done
    [ "$n" != "0" ] && echo "restore: $d <- $n checkpoints from evidence"
  done
fi

marker_dir() {
  case $1 in
    rc_tg128_*) echo output_3d_rc_tg128 ;;
    rc_*)  echo output_3d_ring_collide ;;
    tv_*)  echo output_tv ;;
    svr_*) echo output_3d_svr ;;
    rwo_*) echo output_3d_rwo ;;
    vp_*)  echo output_vp ;;
    vortices_pass_narrow_*)    echo output_vortices_pass_narrow ;;
    vortices_pass_noslip_*)    echo output_vortices_pass_noslip ;;
    vortices_pass_particles_*) echo output_vortices_pass_particles ;;
    *) echo "" ;;
  esac
}

# Restored markers are BACKDATED: snapshot_runs.sh re-runs a config's
# analyzer when its marker is newer than the committed verdict, and a
# freshly-touched marker for a config whose artifacts were wiped (e.g.
# the 512^3 .vti volumes) would overwrite the committed verdict with a
# "no input" failure. A marker restored here never represents NEW
# completion — the verdict on record is already current.
mk() { touch -t 202001010000 "$1"; }

if [ -f "$EV/done_markers.txt" ]; then
  while read -r m; do
    [ -n "$m" ] || continue
    [ -e "$LOGDIR/$m" ] && continue
    name=${m%.done}
    d=$(marker_dir "$name")
    case $name in
      *_init)
        if [ -n "$d" ] && [ -e "$d/gaussian_velocity_0.pt" ]; then
          mk "$LOGDIR/$m" && echo "restore: marker $m"
        fi ;;
      *_advance)
        # Trust an advance marker only when the restored dir holds the
        # run's FINAL checkpoint (3D configs: dt=.1, last_time=2 -> 20;
        # taylor_vortex: 400; vortices_pass family: 500): a snapshot
        # that committed the marker without the full frame set must not
        # let the need-gated density step replay a truncated sequence.
        case $name in
          tv_advance) last=400 ;;
          vp_advance|vortices_pass_*_advance) last=500 ;;
          *) last=20 ;;
        esac
        if [ -n "$d" ] && [ -e "$d/gaussian_velocity_$last.pt" ]; then
          mk "$LOGDIR/$m" && echo "restore: marker $m"
        else
          echo "restore: SKIP marker $m (missing $d/gaussian_velocity_$last.pt)"
        fi ;;
      *)
        mk "$LOGDIR/$m" && echo "restore: marker $m" ;;
    esac
  done < "$EV/done_markers.txt"
fi
