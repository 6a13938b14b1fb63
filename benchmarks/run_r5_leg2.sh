#!/bin/bash
# Round-5 second leg: after the post-campaign probe queue releases the chip,
# (1) run the 1-NNA asymmetry probe (diagnoses the degenerate acc_t/acc_f
# split in the leg-1 cloud metrics), then (2) extend training on every
# cloud-path model — kp 20k->40k, AE 30k->60k (the quality bottleneck:
# cloud-level MMD-CD 0.00316 ~= AE-recon MMD-CD 0.00289, so recon fidelity
# caps generation), lat 25k->50k against the further-trained frozen AE — and
# (3) re-run the full eval suite (cloud CD+EMD, per-category, FastDPM drift).
# Every stage commits via run_r5_campaign.py's own agenda logic.
cd "$(dirname "$0")/.."
POST_PID=${1:?usage: run_r5_leg2.sh <post_queue_pid>}
OUT=runs/r5_campaign
mkdir -p "$OUT"

while kill -0 "$POST_PID" 2>/dev/null; do sleep 30; done
echo "post queue (pid $POST_PID) done $(date)" | tee -a "$OUT/leg2.log"

echo "--- nna_asym start $(date)" | tee -a "$OUT/leg2.log"
python benchmarks/probe_nna_asymmetry.py 200 > "$OUT/nna_asym.out" 2>&1
echo "--- nna_asym rc=$? $(date)" | tee -a "$OUT/leg2.log"
git add benchmarks/results/probe_nna_asymmetry.json 2>/dev/null
git commit -q -m "campaign r5: 1-NNA asymmetry probe (recon-vs-disjoint-refs)" \
  -- benchmarks/results/probe_nna_asymmetry.json 2>/dev/null

echo "--- leg2 campaign start $(date)" | tee -a "$OUT/leg2.log"
python -u benchmarks/run_r5_campaign.py --stages kp,ae,lat,eval \
  --kp-steps 40000 --ae-steps 60000 --lat-steps 50000 \
  >> "$OUT/leg2.log" 2>&1
echo "leg2 done $(date)" | tee -a "$OUT/leg2.log"
