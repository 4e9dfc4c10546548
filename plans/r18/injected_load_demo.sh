#!/bin/bash
# Demonstration for VERDICT r17 #1's "Done" condition: a bench run with
# CPU load injected MID-LOOP must flip low_confidence to true via the
# mid-loop canary trace (the session-boundary canaries alone would have
# passed the window).  Runs the headline loop only (kraken + scale
# probe skipped: the demo targets the loop's own certification).
#
# Usage: bash plans/r18/injected_load_demo.sh
set -u
cd "$(dirname "$0")/../.."

export SPARK_GRAFT_SKIP_KRAKEN=1 SPARK_GRAFT_SKIP_SCALE=1
python bench.py > /tmp/injected_demo_bench.log 2>&1 &
BENCH_PID=$!

# let the loop start and the first probes land, then inject load
sleep 45
STRESS_PIDS=()
for i in $(seq 1 64); do
  python - <<'EOF' &
import hashlib
b = b"\xab" * (1 << 22)
while True:
    hashlib.sha256(b).digest()
EOF
  STRESS_PIDS+=($!)
done
echo "injected 64 stress procs at $(date +%T)"

# hold the load over a few probe intervals, then release
sleep 90
kill "${STRESS_PIDS[@]}" 2>/dev/null
echo "released stress at $(date +%T)"

wait $BENCH_PID
cp BENCH_out.json plans/r18/BENCH_injected_load_demo.json
python - <<'EOF'
import json
d = json.load(open("plans/r18/BENCH_injected_load_demo.json"))
print("low_confidence:", d["low_confidence"])
print("reason:", d.get("low_confidence_reason", "")[:300])
print("window_class:", d.get("window_class"))
for p in d.get("midloop_canaries", []):
    print(" ", p)
EOF
