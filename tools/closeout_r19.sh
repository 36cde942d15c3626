#!/bin/bash
# Round-19 close-out driver (README "Round close-out sequence", binding).
# Runs steps 2-5 and leaves promotion + scaling report + the single
# artifact commit to the operator after flag adjudication.
set -euo pipefail
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "step 2: full sbt test"
sbt -batch test 2>&1 | tail -6
python3 tools/test_counts.py

log "step 3: full Verify sf0.01 + oracle check"
rm -rf /tmp/closeout_verify
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/closeout_verify" 2>&1 | tail -2
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/closeout_verify | tail -3

log "step 4a: DumpPlans -> PLANS.md"
sbt -batch "runMain graft.tools.DumpPlans PLANS.md" 2>&1 | tail -2

log "step 4b: check_bnlj"
python3 tools/check_bnlj.py

log "step 4c: sf0.01 bench -> target/new_sf001.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_OUT=target/new_sf001.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\{"metric"|regression|scaling_flag' | tail -3

log "step 5: sf0.1 bench gated vs OLD committed baseline (scaling vs NEW sf001)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/new_sf01.json \
  SPARK_GRAFT_BENCH_SMALL=target/new_sf001.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\{"metric"|regression|scaling_flag' | tail -3

log "close-out steps 2-5 complete; inspect target/new_sf001.json + target/new_sf01.json, adjudicate, promote, scaling_report, artifact commit"
