#!/bin/bash
# Serial encode-kernel A/B on the real TPU (one process at a time — the
# axon pool wedges under concurrent claims, see the verify skill).
# Usage: nohup tools/run_encode_ab.sh > /tmp/encode_ab.log 2>&1 &
# Waits for /tmp/AXON_OK (written by the recovery probe chain), then:
#   1. tools/bench_encode.py          — standalone microbench + on-chip parity
#   2. bench.py under HIMAN_ENCODE_KERNEL=0/2/3/1 — end-to-end img/s per mode
# Results accumulate in /root/repo/reports/encode_ab_r03.jsonl.
set -u
cd /root/repo
OUT=reports/encode_ab_r03.jsonl
mkdir -p reports

while [ ! -f /tmp/AXON_OK ]; do sleep 60; done
echo "=== pool recovered $(date) ==="

echo "--- microbench ---"
python tools/bench_encode.py --out /tmp/bench_encode.json
[ -f /tmp/bench_encode.json ] && { printf '{"stage": "microbench", "result": %s}\n' "$(cat /tmp/bench_encode.json)" >> "$OUT"; }

for MODE in 0 2 3 1; do
  echo "--- bench.py HIMAN_ENCODE_KERNEL=$MODE $(date) ---"
  HIMAN_ENCODE_KERNEL=$MODE python bench.py > /tmp/bench_mode$MODE.out 2>&1
  rc=$?
  line=$(grep -o '{"metric".*}' /tmp/bench_mode$MODE.out | tail -1)
  printf '{"stage": "e2e", "mode": %s, "rc": %s, "bench": %s}\n' "$MODE" "$rc" "${line:-null}" >> "$OUT"
  tail -2 /tmp/bench_mode$MODE.out
done
echo "=== done $(date) ==="
