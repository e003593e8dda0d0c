#!/bin/bash
# Round-5 chain D (after chain C): the 10M p16 steady-state throughput
# re-run with the fixed free-between-builds bench (chain B's attempt
# hit HBM ResourceExhausted holding two builds at once), plus the
# bit-identity check its failure skipped.
set -u
cd "$(dirname "$0")/.."
export RAD_TPU_MARKER_TIMEOUT=1200

wait_for_pid() {
  if [ -f "$1" ]; then
    while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
  fi
}

LOG=/tmp/r5_campaign_d.log
wait_for_pid /tmp/r5_campaign_c.pid
sleep 90

echo "=== D1: 10M p16 steady-state throughput ($(date)) ===" >> $LOG
python benchmarks/bench_probe_sweep.py --n 10000000 --csize 8192 \
  --sweep "" --throughput qblock:16 --save /tmp/g10m_p16_r5.npz \
  --recall 500 --ef 32,128 --results /tmp/r5_build.jsonl >> $LOG 2>&1
echo "=== D1 rc=$? ($(date)) ===" >> $LOG

echo "=== D2: edge identity r5 vs r4 graph ($(date)) ===" >> $LOG
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
echo "=== D2 rc=$? ($(date)) ===" >> $LOG
