#!/bin/bash
# Round-3 chip-window phase A: the quick measurements that need an idle chip,
# run back-to-back the moment the relay returns (the long campaign follows as
# phase B once these finish).  No set -e: a failing probe must not block the
# rest; each stage logs to its own file under runs/r3_probes/.
cd "$(dirname "$0")/.."
OUT=runs/r3_probes
mkdir -p "$OUT"

echo "=== phase A start $(date)" | tee -a "$OUT/phase_a.log"

echo "--- train_throughput $(date)" | tee -a "$OUT/phase_a.log"
timeout 3600 python benchmarks/train_throughput.py \
  > "$OUT/train_throughput.out" 2>&1
echo "rc=$? $(date)" | tee -a "$OUT/phase_a.log"

echo "--- profile_ae $(date)" | tee -a "$OUT/phase_a.log"
timeout 3600 python benchmarks/profile_ae.py > "$OUT/profile_ae.out" 2>&1
echo "rc=$? $(date)" | tee -a "$OUT/phase_a.log"

echo "--- probe_marching $(date)" | tee -a "$OUT/phase_a.log"
timeout 3600 python benchmarks/probe_marching.py > "$OUT/probe_marching.out" 2>&1
echo "rc=$? $(date)" | tee -a "$OUT/phase_a.log"

echo "--- probe_emd $(date)" | tee -a "$OUT/phase_a.log"
timeout 1800 python benchmarks/probe_emd.py > "$OUT/probe_emd.out" 2>&1
echo "rc=$? $(date)" | tee -a "$OUT/phase_a.log"

echo "=== phase A done $(date)" | tee -a "$OUT/phase_a.log"
