#!/bin/bash
# Round-5 chain E: after the 30M build (C1), run the cheap remaining
# campaigns in value order: morgan-library sweep, bench.py warm pass,
# host-scored 10M e2e.
set -u
cd "$(dirname "$0")/.."
export RAD_TPU_MARKER_TIMEOUT=1200
LOG=/tmp/r5_campaign_e.log

# wait until C1's supervised python tree is gone
while ps -o pid= --ppid "$(cat /tmp/r5_c1.pid 2>/dev/null || echo 99999)" \
      >/dev/null 2>&1 && kill -0 "$(cat /tmp/r5_c1.pid)" 2>/dev/null; do
  sleep 60
done
sleep 60

echo "=== E1: morgan 1M sweep ($(date)) ===" >> $LOG
timeout 2400 python benchmarks/bench_probe_sweep.py --n 1000000 \
  --n-bits 1024 --csize 8192 --library morgan \
  --sweep exact:0,qblock:8,qblock:16 --width 16 --recall 500 \
  --ef 32,128 --results /tmp/r5_morgan.jsonl >> $LOG 2>&1
echo "=== E1 rc=$? ($(date)) ===" >> $LOG
sleep 60

echo "=== E2: bench.py ($(date)) ===" >> $LOG
timeout 900 python bench.py >> $LOG 2>&1
echo "=== E2 rc=$? ($(date)) ===" >> $LOG
sleep 60

echo "=== E3: 10M host-scored e2e ($(date)) ===" >> $LOG
timeout 3600 python benchmarks/bench_e2e.py --n 10000000 \
  --graph /tmp/g10m_p16.npz --stages host_scored \
  --smiles-db /tmp/e2e_smiles.db --host-batch 1024 --pipeline-depth 4 \
  --score-frac 0.01 --results /tmp/r5_hostscored.jsonl >> $LOG 2>&1
echo "=== E3 rc=$? ($(date)) ===" >> $LOG
