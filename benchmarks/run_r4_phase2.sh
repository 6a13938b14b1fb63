#!/bin/bash
# Round-4 phase A2: fixed probe re-runs (profile_ae without the 8.6GB
# captured constant; train_throughput with per-step distinct batches), the
# latent-chain bf16 probe, then the campaign's data + kp stages.  The AE
# stage is NOT launched here: the scatter-free backward decision (from
# profile_ae + a 1k-step A/B) gates how it runs.  Chip flock serializes
# everything.
cd "$(dirname "$0")/.."
OUT=runs/r4_probes
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "--- $name start $(date)" | tee -a "$OUT/phase_a2.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/phase_a2.log"
}

run profile_ae2        timeout 3600 python benchmarks/profile_ae.py
run train_throughput2  timeout 4500 python benchmarks/train_throughput.py
run probe_latent_chain timeout 2700 python benchmarks/probe_latent_chain.py
run campaign_data      timeout 1800 python benchmarks/convergence_campaign.py data
run campaign_kp        timeout 7200 python benchmarks/convergence_campaign.py kp --steps 20000
echo "=== phase A2 done $(date)" | tee -a "$OUT/phase_a2.log"
