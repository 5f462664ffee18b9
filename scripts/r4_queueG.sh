#!/bin/bash
# Round-4 queue G — final: full bench.py on the real chip (verify surface 1).
set -u
cd /root/repo
if [ "${1:-}" != "" ]; then
  echo "waiting for queueF pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi
echo "=== G1: bench.py (real chip) $(date +%H:%M:%S) ==="
timeout 3000 python -u bench.py > /tmp/q_benchG.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"
tail -1 /tmp/q_benchG.log | head -c 600
echo "=== queueG done $(date +%H:%M:%S) ==="
