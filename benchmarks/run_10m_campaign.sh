#!/bin/bash
# 10M measurement chain (run detached; every stage appends to its log +
# results JSONL, so partial progress always survives).
#
#   A. combined sweep in ONE process (compile-session reuse): the fully
#      exact O(N²) baseline build (nodes/s + recall — what the probed
#      recalls are judged against), a high-probe recall point, the
#      unpadded throughput build at the chosen operating point, and the
#      graph save for downstream benches.
#   B. end-to-end artifact on the saved graph (mmap serve + traverse +
#      enrichment).
set -u
cd "$(dirname "$0")/.."

wait_for_pid() {  # serialize on an existing run if present
  if [ -f "$1" ]; then
    while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
  fi
}

wait_for_pid /tmp/sweep10m.pid
sleep 90   # let the server free the dead client's buffers (CLAUDE.md)

echo "=== stage A: exact baseline + high-probe sweep ($(date)) ===" \
  >> /tmp/campaign10m.log
python benchmarks/bench_probe_sweep.py --n 10000000 --csize 8192 \
  --sweep exact:0 --width 64 --throughput qblock:16 \
  --save /tmp/g10m_p16.npz --recall 500 --ef 32,128 \
  >> /tmp/campaign10m.log 2>&1
echo "=== stage A rc=$? ($(date)) ===" >> /tmp/campaign10m.log
sleep 90

echo "=== stage B: end-to-end artifact ($(date)) ===" >> /tmp/campaign10m.log
python benchmarks/bench_e2e.py --n 10000000 --graph /tmp/g10m_p16.npz \
  >> /tmp/campaign10m.log 2>&1
echo "=== stage B rc=$? ($(date)) ===" >> /tmp/campaign10m.log
