#!/bin/bash
# Round-5 torch chain v3 (rebalanced ~14:00): the medium match point
# cannot land on both sides before round end — dropped in favour of the
# lambda=2e-2 kodim12 row (the lambda where the sweep deficit lives) and
# the remaining cross-proxy encodes.
cd /root/reference/coolchic || exit 1
export PYTHONPATH=/root/reference:/root/reference/coolchic:/tmp/refenc:/tmp/refenc/shims
export OMP_NUM_THREADS=1
export TORCH_COMPILE_DISABLE=1
LOG=/tmp/refenc/small/chain_log.txt
echo $$ > /tmp/refenc_chain.pid
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
# ingest the hopper_x proxy the orphan just produced
out=/tmp/refenc/small/out/proxy_hopper_x.cool
if [ -s "$out" ]; then
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/proxy_inflation_probe.py crossproxy --content hopper_x \
    --bitstream "$out" --budget fast >> /tmp/refenc/small/crossproxy_log.txt 2>&1
  echo "CROSSPROXY hopper_x rc=$?" >> $LOG
fi
run_enc() {
  cfg=$1
  out=$(grep '^output:' /tmp/refenc/small/$cfg.yaml | awk '{print $2}')
  if [ -s "$out" ]; then echo "SKIP $cfg (output exists)" >> $LOG; return 0; fi
  echo "START $cfg $(date +%s)" >> $LOG
  t0=$(date +%s)
  nice -n 19 python /tmp/refenc/encode_patched.py --config /tmp/refenc/small/$cfg.yaml \
    > /tmp/refenc/small/${cfg}.log 2>&1
  rc=$?
  t1=$(date +%s)
  echo "DONE $cfg rc=$rc wall_s=$((t1-t0))" >> $LOG
  echo $((t1-t0)) > /tmp/refenc/small/${cfg}.wall
  return $rc
}
match_point() {
  run_enc "$1" || return
  out=$(grep '^output:' /tmp/refenc/small/$1.yaml | awk '{print $2}')
  [ -s "$out" ] || return
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/encoder_match_small.py ingest --seq "$2" --lmbda "$3" \
    --budget "$4" --ref_bitstream "$out" --ref_wall_s "$(cat /tmp/refenc/small/$1.wall 2>/dev/null || echo 0)" \
    >> /tmp/refenc/small/ingest_log.txt 2>&1
  echo "INGEST $1 rc=$?" >> $LOG
}
proxy_point() {
  run_enc "proxy_$1" || return
  out=/tmp/refenc/small/out/proxy_$1.cool
  [ -s "$out" ] || return
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/proxy_inflation_probe.py crossproxy --content "$1" \
    --bitstream "$out" --budget fast >> /tmp/refenc/small/crossproxy_log.txt 2>&1
  echo "CROSSPROXY $1 rc=$?" >> $LOG
}
proxy_point synth1_x
match_point kodim12_192x128_2e-2 kodim12 0.02 fast
proxy_point hopper2_x
echo "R5 CHAIN3 COMPLETE $(date +%s)" >> $LOG
