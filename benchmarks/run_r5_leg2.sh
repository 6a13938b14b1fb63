#!/bin/bash
# Round-5 second leg (deadline-rescoped): after the post-campaign probe queue
# releases the chip, run the 1-NNA asymmetry probe (diagnoses the degenerate
# acc_t/acc_f split in the leg-1 cloud metrics) and commit its artifact.
# The originally-planned training extension (kp 40k / AE 60k / lat 50k +
# re-eval, ~4.7 h of chip time) was cut: the round's wall-clock budget ends
# ~2 h after the leg-1 eval, and holding the chip flock into the driver's
# end-of-round bench.py run would corrupt the headline measurement.
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
echo "leg2 done $(date)" | tee -a "$OUT/leg2.log"
