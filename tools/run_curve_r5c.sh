#!/bin/bash
# Follow-up queue: waits for run_curve_r5b.sh to finish (one TPU chip),
# then measures the wide-XLA sharded comparison points for the tp06
# block-kernel whitelist decision.
cd /root/repo
while kill -0 "$(cat /tmp/curve_r5b.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
LOG=tools/out/compile_curve_r5c.log
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 3600 python tools/compile_curve.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run tp06 --flavor widexla --skip
run tp06 --flavor widexla
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
