#!/bin/bash
# Round-4 post-campaign chip agenda: the two remaining measurements that kept
# losing the chip flock to the campaign (ROUND4.md item 4), then a local
# validation run of the round-end bench.  Serialized by the chip flock inside
# each python entry point; run only after run_r4_campaign_resume.sh is done.
cd "$(dirname "$0")/.."
OUT=runs/r4_post
mkdir -p "$OUT" benchmarks/results

run() {
  local name=$1; shift
  echo "--- $name start $(date)" | tee -a "$OUT/agenda.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "--- $name rc=$? $(date)" | tee -a "$OUT/agenda.log"
}

run probe_latent_chain timeout 2400 python benchmarks/probe_latent_chain.py
cp -f benchmarks/latent_chain.json benchmarks/results/probe_latent_chain.json 2>/dev/null

run bench timeout 5400 python bench.py
# keep the bench JSON line as a tracked artifact for ROUND4.md's final table
grep -h '"metric"' "$OUT/bench.out" | tail -1 > benchmarks/results/bench_r4_local.json

echo "=== post-campaign agenda done $(date)" | tee -a "$OUT/agenda.log"
