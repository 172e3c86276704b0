#!/bin/bash
# Round-5 torch chain v2: wait for the in-flight kodim12_1e-3 encode, then
# ingest it; then the 2e-2 point, the three cross-proxy encodes (lambda=
# 1e-4 fast, for the calibration probe), the medium match point, and the
# optional kodim12 2e-2. Each match point auto-ingests; each proxy point
# auto-installs via `crossproxy`.
cd /root/reference/coolchic || exit 1
export PYTHONPATH=/root/reference:/root/reference/coolchic:/tmp/refenc:/tmp/refenc/shims
export OMP_NUM_THREADS=1
export TORCH_COMPILE_DISABLE=1
LOG=/tmp/refenc/small/chain_log.txt
echo $$ > /tmp/refenc_chain.pid

# wait for the orphaned kodim12_1e-3 encode (pid recorded by caller)
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
out=/tmp/refenc/small/out/kodim12_192x128_1e-3.cool
if [ -s "$out" ]; then
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/encoder_match_small.py ingest --seq kodim12 --lmbda 0.001 \
    --budget fast --ref_bitstream "$out" --ref_wall_s 3300 \
    >> /tmp/refenc/small/ingest_log.txt 2>&1
  echo "INGEST kodim12_1e-3 rc=$?" >> $LOG
fi

run_enc() {  # $1 cfg-stem -> rc; logs wall time
  cfg=$1
  out=$(grep '^output:' /tmp/refenc/small/$cfg.yaml | awk '{print $2}')
  if [ -s "$out" ]; then echo "SKIP $cfg (output exists)" >> $LOG; return 0; fi
  echo "START $cfg $(date +%s)" >> $LOG
  t0=$(date +%s)
  nice -n 10 python /tmp/refenc/encode_patched.py --config /tmp/refenc/small/$cfg.yaml \
    > /tmp/refenc/small/${cfg}.log 2>&1
  rc=$?
  t1=$(date +%s)
  echo "DONE $cfg rc=$rc wall_s=$((t1-t0))" >> $LOG
  echo $((t1-t0)) > /tmp/refenc/small/${cfg}.wall
  return $rc
}

match_point() {  # $1 cfg-stem, $2 seq, $3 lmbda, $4 budget
  run_enc "$1" || return
  out=$(grep '^output:' /tmp/refenc/small/$1.yaml | awk '{print $2}')
  [ -s "$out" ] || return
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/encoder_match_small.py ingest --seq "$2" --lmbda "$3" \
    --budget "$4" --ref_bitstream "$out" --ref_wall_s "$(cat /tmp/refenc/small/$1.wall 2>/dev/null || echo 0)" \
    >> /tmp/refenc/small/ingest_log.txt 2>&1
  echo "INGEST $1 rc=$?" >> $LOG
}

proxy_point() {  # $1 content
  run_enc "proxy_$1" || return
  out=/tmp/refenc/small/out/proxy_$1.cool
  [ -s "$out" ] || return
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    /root/repo/scripts/proxy_inflation_probe.py crossproxy --content "$1" \
    --bitstream "$out" --budget fast >> /tmp/refenc/small/crossproxy_log.txt 2>&1
  echo "CROSSPROXY $1 rc=$?" >> $LOG
}

match_point kodim15_192x128_2e-2 kodim15 0.02 fast
proxy_point hopper_x
proxy_point synth1_x
proxy_point hopper2_x
match_point kodim15_192x128_4e-3_medium kodim15 0.004 medium
match_point kodim12_192x128_2e-2 kodim12 0.02 fast
echo "R5 CHAIN2 COMPLETE $(date +%s)" >> $LOG
