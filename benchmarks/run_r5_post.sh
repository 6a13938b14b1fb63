#!/bin/bash
# Round-5 post-campaign chip queue: waits for the campaign agenda process to
# exit, then runs the SAP quality diagnostic and the three perf probes in
# strict sequence (the chip flock serializes each against stragglers), and
# commits the result JSONs.  Launched alongside the agenda so the whole
# round's chip work runs unattended.
cd "$(dirname "$0")/.."
AGENDA_PID=${1:?usage: run_r5_post.sh <agenda_pid>}
OUT=runs/r5_campaign
mkdir -p "$OUT"

while kill -0 "$AGENDA_PID" 2>/dev/null; do sleep 30; done
echo "agenda (pid $AGENDA_PID) done $(date)" | tee -a "$OUT/post.log"

run() {
  local name=$1; shift
  echo "--- $name start $(date)" | tee -a "$OUT/post.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/post.log"
}

run sapdiag python benchmarks/convergence_campaign.py sapdiag
cp -f runs/convergence/sapdiag.json benchmarks/results/sapdiag.json 2>/dev/null
cp -f runs/convergence/aediag.json benchmarks/results/aediag.json 2>/dev/null

run latent_chain       python benchmarks/probe_latent_chain.py
run latent_fused_drift python benchmarks/probe_latent_fused_drift.py
run profile_sap_latent python benchmarks/profile_sap_latent.py

git add benchmarks/results benchmarks/latent_chain.json 2>/dev/null
git commit -q -m "campaign r5: post-campaign probe artifacts (sapdiag, latent chain/drift, sap+latent rooflines)" -- benchmarks/results benchmarks/latent_chain.json 2>/dev/null
echo "post queue done $(date)" | tee -a "$OUT/post.log"
