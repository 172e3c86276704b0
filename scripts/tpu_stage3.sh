#!/bin/bash
# Stage 3 (tpu_stage3): time-boxed chip scheduler for the two zero-coverage
# datasets. After stage2 hands the chip to the fast:jvet sweep, give jvet
# HALF the remaining round time, then stop it (by pidfile, never pattern),
# finalize, and hand the chip to fast:clic20-pro-valid until round end.
# Both sweeps are checkpointed; finalize is CPU-forced and safe alongside.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
PY=/opt/venv/bin/python
LOG=/tmp/tpu_stage3_log.txt
echo $$ > /tmp/tpu_stage3.pid
END=$(date -d '2026-08-20 09:10 UTC' +%s)   # hard end, leaves margin for driver bench

log() { echo "$1 $(date +%s)" >> $LOG; }

sweep_alive() {  # any kodak_rd_sweep.py process alive?
  for p in /proc/[0-9]*; do
    grep -qa "kodak_rd_sweep" "$p/cmdline" 2>/dev/null && return 0
  done
  return 1
}

stop_sweeps() {
  $PY - <<'EOF'
import bench
print("stage3 stop:", bench.stop_sweep_processes(
    pidfiles=[
        "/root/repo/results/image/jvet/tpu_sweep/run.pid",
        "/root/repo/results/image/clic20-pro-valid/tpu_sweep/run.pid",
    ],
    cmdline_tags=("rd_sweep",)))
EOF
}

run_stage() {  # $1 dataset, $2 window-end timestamp
  ds=$1; until_ts=$2
  last_fin=$(date +%s)
  while [ "$(date +%s)" -lt "$until_ts" ]; do
    if ! sweep_alive; then
      log "relaunch $ds"
      $PY scripts/kodak_rd_sweep.py finalize --budget fast --dataset $ds \
        >> /tmp/sweep_fin_$ds.log 2>&1
      nohup $PY scripts/kodak_rd_sweep.py run --max_attempts 400 \
        --budget fast --dataset $ds >> /tmp/sweep_run_fast_$ds.log 2>&1 &
      sleep 120
    fi
    sleep 60
    now=$(date +%s)
    if [ $((now - last_fin)) -ge 2700 ]; then
      last_fin=$now
      $PY scripts/kodak_rd_sweep.py finalize --budget fast --dataset $ds \
        >> /tmp/sweep_fin_$ds.log 2>&1
    fi
  done
  log "window over: stopping $ds"
  stop_sweeps
  sleep 20
  $PY scripts/kodak_rd_sweep.py finalize --budget fast --dataset $ds \
    >> /tmp/sweep_fin_$ds.log 2>&1
  log "finalized $ds"
}

# wait for stage2 to hand over (it nohups the jvet run loop at its end)
while ! grep -q "STAGE2 DONE" /tmp/tpu_stage2_log.txt 2>/dev/null; do sleep 120; done
log "stage3 start"
T0=$(date +%s)
LEFT=$((END - T0))
if [ $LEFT -le 1800 ]; then log "no time left; exit"; exit 0; fi
JVET_END=$((T0 + LEFT / 2))
log "jvet window until $JVET_END"
run_stage jvet $JVET_END
log "clic window until $END"
run_stage clic20-pro-valid $END
log "STAGE3 DONE"
