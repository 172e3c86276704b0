#!/bin/bash
# Round-5 hypernet window: full-corpus retrain (NO -> Delta) then the
# complete 24-image evaluation set. Assumes the RD sweep has been stopped
# (the caller owns chip scheduling). hypernet_demo train writes
# results/hypernet_demo/run.pid, which bench.py's teardown covers.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
LOG=/tmp/hn_stage_log.txt
echo $$ > /tmp/hn_stage.pid
step() {  # $1 timeout, rest: args
  t=$1; shift
  echo "STEP $* $(date +%s)" >> $LOG
  timeout $t nice -n -5 python scripts/hypernet_demo.py "$@" \
    >> /tmp/hn_stage_out.log 2>&1
  echo "STEP-DONE rc=$? $* $(date +%s)" >> $LOG
}
step 7200 train --full --platform tpu
step 3600 eval --full --platform tpu --n_images 24
step 3600 ablation --full --platform tpu --n_images 24 --lmbdas 0.001,0.004
step 3600 oneshot --full --platform tpu --n_images 24 --lmbdas 0.001,0.004
step 1800 curves --full --platform tpu --n_images 6
echo "HN STAGE COMPLETE $(date +%s)" >> $LOG
