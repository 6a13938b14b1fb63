#!/bin/bash
# Round-3 convergence campaign (VERDICT r2 item 4): extend AE training,
# retrain latent against the NEW AE latent space, eval with cloud-level EMD +
# the AE-recon diagnostic + FastDPM quality drift, then give SAP whatever
# chip time remains.  The old latent/SAP exps trained against the 4874-step
# AE are moved aside (a frozen-AE stage is only valid for the AE it was
# trained against).
#
# Stage order puts eval BEFORE sap: the cloud-level metric suite (the
# acc_f 0.99 question) depends only on kp+AE+latent; SAP feeds meshes, not
# the 2048-pt cloud metrics.
#
# Budgets via env: AE_STEPS / LAT_STEPS / SAP_STEPS (absolute targets;
# stages resume from checkpoints).
set -e
cd "$(dirname "$0")/.."
EXPS=runs/convergence/exps

AE_STEPS=${AE_STEPS:-30000}
LAT_STEPS=${LAT_STEPS:-25000}
SAP_STEPS=${SAP_STEPS:-10000}

if [ -d "$EXPS/lat" ] && [ ! -d "$EXPS/lat_r2_frozen_ae4874" ]; then
  mv "$EXPS/lat" "$EXPS/lat_r2_frozen_ae4874"
fi
if [ -d "$EXPS/sap" ] && [ ! -d "$EXPS/sap_r2_frozen_ae4874" ]; then
  mv "$EXPS/sap" "$EXPS/sap_r2_frozen_ae4874"
fi

log=runs/convergence/campaign_r3.log
{
  echo "=== ae -> $AE_STEPS  $(date)"
  python benchmarks/convergence_campaign.py ae --steps "$AE_STEPS"
  echo "=== lat -> $LAT_STEPS (fresh, new AE)  $(date)"
  python benchmarks/convergence_campaign.py lat --steps "$LAT_STEPS"
  echo "=== eval (T=1000 + EMD + ae-recon + fastdpm S=50/100)  $(date)"
  python benchmarks/convergence_campaign.py eval
  echo "=== sap -> $SAP_STEPS (fresh, new AE)  $(date)"
  python benchmarks/convergence_campaign.py sap --steps "$SAP_STEPS"
  echo "=== campaign done  $(date)"
} >> "$log" 2>&1
