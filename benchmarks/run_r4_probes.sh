#!/bin/bash
# Round-4 phase A: the quick clean-chip measurements (VERDICT r3 item 1),
# run back-to-back on the idle chip before the long retrain campaign
# (phase B).  Each python stage acquires the /tmp chip flock itself
# (benchmarks/chip_lock.py) so nothing can overlap.  No set -e: a failing
# probe must not block the rest.
cd "$(dirname "$0")/.."
OUT=runs/r4_probes
mkdir -p "$OUT"

echo "=== phase A start $(date)" | tee -a "$OUT/phase_a.log"

for stage in train_throughput profile_ae probe_marching probe_emd; do
  echo "--- $stage $(date)" | tee -a "$OUT/phase_a.log"
  timeout 3600 python "benchmarks/$stage.py" > "$OUT/$stage.out" 2>&1
  echo "rc=$? $(date)" | tee -a "$OUT/phase_a.log"
done

echo "=== phase A done $(date)" | tee -a "$OUT/phase_a.log"
