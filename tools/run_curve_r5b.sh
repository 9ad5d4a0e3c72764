#!/bin/bash
# Round-5 follow-up compile-curve points (sequential — one TPU chip).
cd /root/repo
LOG=tools/out/compile_curve_r5b.log
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 3600 python tools/compile_curve.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run tp06 --spl 5 --flavor block            # whitelist decision: runtime
run tp06 --spl 5 --flavor block --skip     # likely best sharded tp06
run tp06 --spl 2 --skip                    # re-check the 2568 anomaly
run court --spl 1                          # curve completeness
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
