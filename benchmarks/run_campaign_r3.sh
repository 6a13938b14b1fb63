#!/bin/bash
# Round-3 convergence campaign (VERDICT r2 item 4): extend AE to 30k, retrain
# latent (30k) and SAP (10k) against the NEW AE latent space, then eval with
# cloud-level EMD + FastDPM quality drift.  The old latent/SAP exps trained
# against the 4874-step AE are moved aside (a frozen-AE stage is only valid
# for the AE it was trained against).
set -e
cd "$(dirname "$0")/.."
EXPS=runs/convergence/exps

if [ -d "$EXPS/lat" ] && [ ! -d "$EXPS/lat_r2_frozen_ae4874" ]; then
  mv "$EXPS/lat" "$EXPS/lat_r2_frozen_ae4874"
fi
if [ -d "$EXPS/sap" ] && [ ! -d "$EXPS/sap_r2_frozen_ae4874" ]; then
  mv "$EXPS/sap" "$EXPS/sap_r2_frozen_ae4874"
fi

log=runs/convergence/campaign_r3.log
{
  echo "=== ae -> 30k  $(date)"
  python benchmarks/convergence_campaign.py ae
  echo "=== lat -> 30k (fresh, new AE)  $(date)"
  python benchmarks/convergence_campaign.py lat
  echo "=== sap -> 10k (fresh, new AE)  $(date)"
  python benchmarks/convergence_campaign.py sap
  echo "=== eval (T=1000 + EMD + fastdpm S=50/100)  $(date)"
  python benchmarks/convergence_campaign.py eval
  echo "=== campaign done  $(date)"
} >> "$log" 2>&1
