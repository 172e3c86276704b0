#!/bin/bash
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
echo $$ > /tmp/ems_chain.pid
echo "START kodim12 0.02 fast $(date +%s)" >> /tmp/ems_chain_log.txt
nice -n 19 python scripts/encoder_match_small.py ours --seq kodim12 --lmbda 0.02 \
  --budget fast > /tmp/ems_kodim12_0.02_fast.log 2>&1
echo "DONE kodim12 0.02 fast rc=$? $(date +%s)" >> /tmp/ems_chain_log.txt
