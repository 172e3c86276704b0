#!/bin/bash
# Small-scale same-budget encoder-match chain (192x128 targets, c3x fast).
cd /root/reference/coolchic || exit 1
export PYTHONPATH=/root/reference:/root/reference/coolchic:/tmp/refenc:/tmp/refenc/shims
export OMP_NUM_THREADS=1
export TORCH_COMPILE_DISABLE=1
LOG=/tmp/refenc/small/chain_log.txt
for cfg in kodim15_192x128_4e-3 kodim12_192x128_4e-3 kodim17_128x192_4e-3 kodim12_192x128_1e-3; do
  out=$(grep '^output:' /tmp/refenc/small/$cfg.yaml | awk '{print $2}')
  if [ -s "$out" ]; then echo "SKIP $cfg (output exists)" >> $LOG; continue; fi
  echo "START $cfg $(date +%s)" >> $LOG
  t0=$(date +%s)
  nice -n 10 python /tmp/refenc/encode_patched.py --config /tmp/refenc/small/$cfg.yaml \
    > /tmp/refenc/small/${cfg}.log 2>&1
  rc=$?
  t1=$(date +%s)
  echo "DONE $cfg rc=$rc wall_s=$((t1-t0))" >> $LOG
  if [ $rc -eq 0 ] && [ -s "$out" ]; then
    seq=$(echo $cfg | sed 's/_[0-9]*x[0-9]*_.*//')
    lm=$(grep '^lmbda:' /tmp/refenc/small/$cfg.yaml | awk '{print $2}')
    PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      /root/repo/scripts/encoder_match_small.py ingest --seq "$seq" --lmbda "$lm" \
      --ref_bitstream "$out" --ref_wall_s $((t1-t0)) \
      >> /tmp/refenc/small/ingest_log.txt 2>&1
  fi
done
echo "SMALL CHAIN COMPLETE $(date +%s)" >> $LOG
