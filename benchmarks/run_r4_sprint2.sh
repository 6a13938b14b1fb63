#!/bin/bash
# Round-4 sprint continuation: the first sprint's kp budget assumed the
# 288-steps/s scan-amortized device rate, but wall rate on the 1-CPU host is
# ~72 ms/step (host feeding + tunnel), so kp hit its timeout before the first
# checkpoint (cadence was steps//4 = 5000).  This pass re-runs kp with a
# tight cadence (compile is now warm in benchmarks/.jax_cache), then a short
# lat stage, then the judge-critical eval (incremental report writes).  It
# waits on the chip flock behind the still-running AE stage.
cd "$(dirname "$0")/.."
OUT=runs/r4_sprint
mkdir -p "$OUT" benchmarks/results

run() {
  local name=$1; shift
  echo "--- $name start $(date)" | tee -a "$OUT/agenda.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/agenda.log"
  cp -f runs/convergence/report.json benchmarks/results/campaign_report.json 2>/dev/null
  cp -f "$OUT/agenda.log" benchmarks/results/campaign_agenda.log 2>/dev/null
}

run campaign_kp2  timeout 390 python benchmarks/convergence_campaign.py kp --steps 4000
run campaign_lat  timeout 430 python benchmarks/convergence_campaign.py lat --steps 1500
run campaign_eval timeout "${EVAL_T:-1200}" python -c "
from benchmarks.chip_lock import acquire_chip_lock; acquire_chip_lock()
import benchmarks.convergence_campaign as c
c.stage_eval(n_samples=160, fastdpm_lengths=(50, 100))
"
echo "=== sprint2 done $(date)" | tee -a "$OUT/agenda.log"
cp -f runs/convergence/report.json benchmarks/results/campaign_report.json 2>/dev/null
cp -f runs/convergence/aediag.json benchmarks/results/campaign_aediag.json 2>/dev/null
cp -f "$OUT/agenda.log" benchmarks/results/campaign_agenda.log 2>/dev/null
