#!/bin/bash
# Unattended round-3 chip agenda.  Waits for the relay-recovery marker
# (/tmp/tpu_back, written by the poll loop) and then runs the queued chip
# work STRICTLY SEQUENTIALLY (the chip is a single shared resource — any
# overlap inflates measurements 5-50x, see CLAUDE.md).  Ordered by value
# per chip-hour:
#   1. clean train_throughput (fixes the contaminated r2 JSON, VERDICT item 3)
#   2. campaign AE -> 30k, latent -> 25k fresh, eval w/ cloud-level EMD +
#      FastDPM drift (VERDICT items 4, 5, 2)
#   3. profile_ae (scatter-free backward decision) + marching/EMD probes
#   4. SAP retrain with whatever chip time remains
# Every stage has its own log and a generous timeout backstop; stages are
# resumable (training checkpoints, incremental report writes), so a kill
# mid-stage loses at most one checkpoint interval.
cd "$(dirname "$0")/.."
OUT=runs/r3_chip
mkdir -p "$OUT"

while [ ! -f /tmp/tpu_back ]; do sleep 30; done
echo "=== relay back, agenda start $(date)" >> "$OUT/agenda.log"

run() {
  local name=$1; shift
  echo "--- $name start $(date)" >> "$OUT/agenda.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" >> "$OUT/agenda.log"
}

run train_throughput timeout 4500 python benchmarks/train_throughput.py

# retire the stages trained against the old (4874-step) AE before the fresh
# latent/SAP retrains (a frozen-AE stage is only valid for the AE it was
# trained against)
EXPS=runs/convergence/exps
if [ -d "$EXPS/lat" ] && [ ! -d "$EXPS/lat_r2_frozen_ae4874" ]; then
  mv "$EXPS/lat" "$EXPS/lat_r2_frozen_ae4874"
fi
if [ -d "$EXPS/sap" ] && [ ! -d "$EXPS/sap_r2_frozen_ae4874" ]; then
  mv "$EXPS/sap" "$EXPS/sap_r2_frozen_ae4874"
fi

run campaign_ae   timeout 16200 python benchmarks/convergence_campaign.py ae --steps 30000
run campaign_lat  timeout 10800 python benchmarks/convergence_campaign.py lat --steps 25000
run campaign_eval timeout 10800 python benchmarks/convergence_campaign.py eval
run profile_ae    timeout 2700 python benchmarks/profile_ae.py
run probe_marching timeout 2700 python benchmarks/probe_marching.py
run probe_emd     timeout 1800 python benchmarks/probe_emd.py
run campaign_sap  timeout 14400 python benchmarks/convergence_campaign.py sap --steps 10000
run bench_final   timeout 3600 python bench.py
echo "=== agenda done $(date)" >> "$OUT/agenda.log"
