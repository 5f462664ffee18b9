#!/bin/bash
# Round-4 finalization (run manually near round end): persist every run's
# evidence, refresh COPYCHECK-sensitive docs, show the round's numbers.
set -u
cd /root/repo
for d in runs/*/; do
  name=$(basename "$d")
  [ -f "$d/metrics.jsonl" ] || continue
  python scripts/persist_evidence.py "$d" --name "r4_$name" 2>/dev/null | tail -1
done
echo "=== bench files ==="
ls BENCH_r0*.json 2>/dev/null
echo "=== evidence dirs ==="
ls docs/evidence/
