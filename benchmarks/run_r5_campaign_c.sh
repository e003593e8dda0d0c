#!/bin/bash
# Round-5 chain C (after chain B): the 30M single-chip build and the
# 10M host-scored end-to-end row.
set -u
cd "$(dirname "$0")/.."
export RAD_TPU_MARKER_TIMEOUT=1200

wait_for_pid() {
  if [ -f "$1" ]; then
    while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
  fi
}

LOG=/tmp/r5_campaign_c.log
wait_for_pid /tmp/r5_campaign.pid
sleep 90

echo "=== C1: 30M single-chip probed build ($(date)) ===" >> $LOG
python benchmarks/bench_build_big.py --n 30000000 --connectivity 8 \
  --probes 16 --csize 8192 --recall 500 --ef 32,128 \
  --save /tmp/g30m_slim.npz --traverse-budget 1000000 \
  --results /tmp/r5_build30m.jsonl >> $LOG 2>&1
echo "=== C1 rc=$? ($(date)) ===" >> $LOG
sleep 90

echo "=== C2: 10M host-scored e2e ($(date)) ===" >> $LOG
python benchmarks/bench_e2e.py --n 10000000 --graph /tmp/g10m_p16.npz \
  --stages host_scored --smiles-db /tmp/e2e_smiles.db \
  --host-batch 1024 --pipeline-depth 4 --score-frac 0.01 \
  --results /tmp/r5_hostscored.jsonl >> $LOG 2>&1
echo "=== C2 rc=$? ($(date)) ===" >> $LOG
