#!/bin/bash
# Round-4 sprint campaign: the third from-scratch retrain this round (the VM
# reset at ~01:18 wiped runs/ AGAIN, taking every checkpoint of the full
# run_r4_campaign_resume.sh attempt with it).  This variant is sized to the
# ~40 minutes of chip time that remain in the round: reduced step budgets,
# no SAP corpus/stage, aediag folded into eval's ae_recon block, eval at
# n_samples=200 with FastDPM S=50/S=100 drift rows and cloud-level EMD.
# Every stage takes the /tmp chip flock itself; report blocks are written
# incrementally so a deadline kill still leaves a valid report.json.
cd "$(dirname "$0")/.."
OUT=runs/r4_sprint
mkdir -p "$OUT" benchmarks/results
DEADLINE=${DEADLINE:-$(( $(date +%s) + 2400 ))}

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  local name=$1; shift
  echo "--- $name start $(date) (left $(left)s)" | tee -a "$OUT/agenda.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/agenda.log"
  # persist after EVERY stage: a VM reset mid-agenda has now happened twice
  cp -f runs/convergence/report.json benchmarks/results/campaign_report.json 2>/dev/null
  cp -f "$OUT/agenda.log" benchmarks/results/campaign_agenda.log 2>/dev/null
}

# main 5-category corpus only (the SAP 128^3-DPSR corpus is skipped with the
# SAP stage — no chip time for it this sprint)
run data timeout 600 python -c "
from benchmarks.chip_lock import acquire_chip_lock; acquire_chip_lock()
import benchmarks.convergence_campaign as c
from slide_tpu.data.synthetic import write_synthetic_shapenet_psr
import time; t0 = time.time()
write_synthetic_shapenet_psr(c.DATA, categories=c.SYNSETS,
    models_per_split=c.MODELS_PER_SPLIT, num_points=3000, seed=11,
    with_psr=False, shape_variety=True)
print(f'corpus: {len(c.SYNSETS)} cats x {c.MODELS_PER_SPLIT}/split'
      f' ({time.time()-t0:.0f}s)')
"

run campaign_kp  timeout 420 python benchmarks/convergence_campaign.py kp --steps 20000
run campaign_ae  timeout 780 python benchmarks/convergence_campaign.py ae --steps 2000
run campaign_lat timeout 540 python benchmarks/convergence_campaign.py lat --steps 3500

EVAL_T=$(left)
if [ "$EVAL_T" -gt 300 ]; then
  run campaign_eval timeout "$EVAL_T" python -c "
from benchmarks.chip_lock import acquire_chip_lock; acquire_chip_lock()
import benchmarks.convergence_campaign as c
c.stage_eval(n_samples=200, fastdpm_lengths=(50, 100))
"
else
  echo "--- campaign_eval SKIPPED (left $(left)s)" | tee -a "$OUT/agenda.log"
fi
echo "=== sprint done $(date) (left $(left)s)" | tee -a "$OUT/agenda.log"
cp -f "$OUT/agenda.log" benchmarks/results/campaign_agenda.log 2>/dev/null
