#!/bin/bash
# Round-5 measurement chain (run detached; every stage appends to its
# log + results JSONL so partial progress survives).
#
#   B1. 10M probed p16 throughput build with the r5 build path
#       (bucketed symm + streamed select + packed-key bisect) — twice,
#       steady-state timed, saved for the bit-identity check + recall
#       evals at ef32/128 (should reproduce 0.7064 / 0.9000 exactly).
#   B2. bit-identity: r5 graph vs the r4 saved graph, edge for edge.
#   B3. p8 / p32 recall sweep at ef32+ef128 (width-64 shared compile).
#   B4. morgan-library 1M sweep: exact vs probed p8/p16 at ef32/128
#       (the second library class, VERDICT r4 item 2c).
#   B5. bench.py (keeps BENCH_r05 warm, VERDICT item 8).
set -u
cd "$(dirname "$0")/.."
export RAD_TPU_MARKER_TIMEOUT=1200

wait_for_pid() {
  if [ -f "$1" ]; then
    while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
  fi
}

LOG=/tmp/r5_campaign.log
wait_for_pid /tmp/gap10m.pid
sleep 90

echo "=== B1: r5-path 10M p16 throughput build ($(date)) ===" >> $LOG
python benchmarks/bench_probe_sweep.py --n 10000000 --csize 8192 \
  --sweep "" --throughput qblock:16 --save /tmp/g10m_p16_r5.npz \
  --recall 500 --ef 32,128 --results /tmp/r5_build.jsonl >> $LOG 2>&1
echo "=== B1 rc=$? ($(date)) ===" >> $LOG
sleep 60

echo "=== B2: edge identity r5 vs r4 graph ($(date)) ===" >> $LOG
PYTHONPATH=$PWD JAX_PLATFORMS=cpu python - >> $LOG 2>&1 <<'EOF'
import numpy as np
from rad_tpu.graph.storage import HNSWGraph
a = HNSWGraph.load("/tmp/g10m_p16.npz", mmap=True)
b = HNSWGraph.load("/tmp/g10m_p16_r5.npz", mmap=True)
same = all(np.array_equal(np.asarray(x), np.asarray(y))
           for x, y in zip(a.neighbors, b.neighbors))
print({"metric": "r5_build_identity", "edge_identical": bool(same)})
assert same
EOF
echo "=== B2 rc=$? ($(date)) ===" >> $LOG

echo "=== B3: p8/p32 sweep ef32+128 ($(date)) ===" >> $LOG
python benchmarks/bench_probe_sweep.py --n 10000000 --csize 8192 \
  --sweep qblock:8,qblock:32 --width 64 --recall 500 --ef 32,128 \
  --results /tmp/r5_sweep.jsonl >> $LOG 2>&1
echo "=== B3 rc=$? ($(date)) ===" >> $LOG
sleep 60

echo "=== B4: morgan 1M sweep ($(date)) ===" >> $LOG
python benchmarks/bench_probe_sweep.py --n 1000000 --n-bits 1024 \
  --csize 8192 --library morgan --sweep exact:0,qblock:8,qblock:16 \
  --width 16 --recall 500 --ef 32,128 \
  --results /tmp/r5_morgan.jsonl >> $LOG 2>&1
echo "=== B4 rc=$? ($(date)) ===" >> $LOG
sleep 60

echo "=== B5: bench.py ($(date)) ===" >> $LOG
timeout 1800 python bench.py >> $LOG 2>&1
echo "=== B5 rc=$? ($(date)) ===" >> $LOG
