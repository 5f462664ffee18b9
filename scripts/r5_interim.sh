#!/bin/bash
# Round-5 interim chip slot (between queue A and B): probes + render
# recoveries, then hands off to queue B.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueA pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== interim start $(date +%H:%M:%S) ==="

echo "=== X1: probeX (rolled scatter/F4 arms + garf batch arms) ==="
P_STEPS=20 timeout 2400 python -u scripts/r5_probeX.py > /tmp/r5/probeX.log 2>&1
echo "probeX exit=$? $(date +%H:%M:%S)"
grep -a '^{' /tmp/r5/probeX.log

echo "=== X2: INGP rolled render recovery ==="
timeout 1800 python -u scripts/r5_render_ingp_rolled.py > /tmp/r5/render_ingp_rolled.log 2>&1
echo "render_ingp exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_rolled --name quality_ingp3d_rolled || true
grep -a "novel_view_summary" /tmp/r5/render_ingp_rolled.log | head -c 400; echo

echo "=== X3: Mip sharp best-val render ==="
timeout 1800 python -u scripts/r5_render_mip_sharp_bestval.py > /tmp/r5/render_mip_bestval.log 2>&1
echo "render_mip_bestval exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_sharp --name quality_mip_sharp || true
grep -a "novel_view_summary_bestval" /tmp/r5/render_mip_bestval.log | head -c 400; echo

echo "=== interim done $(date +%H:%M:%S) ==="
