#!/bin/bash
# Round-3 overtime queue (after the 13:05 deadline the round kept running).
# Priority order:
#   1. Long-budget hypothesis test: the fusion-protocol table shows EDRL
#      variants at ~0.55 val acc with train loss still 1.4-2.0 (NOT
#      converged) vs Multi_ResNet's 0.074 — i.e. the late-fusion gap is
#      plausibly a training-budget artifact (25 ep x 256 samples for a
#      ~100M-param dual-backbone model).  75-epoch runs of full EDRL and
#      the late-fusion control, same protocol/seed, land in
#      ABLATION_FUSION_LONG.md (separate output: the resume guard would
#      otherwise archive the 25-epoch rows as protocol-stale).
#   2. Complete n=2 for the 25-epoch fusion table (seed-1 -DILR and
#      Multi_ResNet were cut by the 13:05 deadline).
#   3. Widen: 75-epoch ablated variants, then seed 2 at 25 epochs.
# Restart-safe: every run resumes from its .jsonl; deadline-guarded like
# run_ablation_study.sh.
set -u
cd "$(dirname "$0")/.."
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"
RUN_TIMEOUT="${RUN_TIMEOUT:-7200}"
past_deadline() {
  [ -f "$DEADLINE_FILE" ] || return 1
  local d now
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || return 1
  now=$(date +%s)
  [ -n "$d" ] && [ "$now" -ge "$d" ]
}
# run <seed> <epochs> <output-or-"-"> <variant>
run() {
  local seed="$1" epochs="$2" output="$3" variant="$4"
  if past_deadline; then
    echo "--- deadline ($(cat "$DEADLINE_FILE")) passed; stopping cleanly ---"
    exit 3
  fi
  echo "--- driving: $variant s$seed ep$epochs out=$output ---"
  local extra=()
  [ "$output" != "-" ] && extra=(--output "$output")
  timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
    --protocol fusion --epochs "$epochs" --seeds "$seed" \
    --variants "$variant" ${extra[@]+"${extra[@]}"} || exit 1
}
LONG=ABLATION_FUSION_LONG.md
# 1. hypothesis test (~25 min + ~12 min, warm cache)
run 0 75 "$LONG" "MedFusion (full EDRL)"
run 0 75 "$LONG" "Multi_ResNet (late fusion)"
# 2. finish n=2 for the 25-epoch table
run 1 25 - "MedFusion -DILR"
run 1 25 - "Multi_ResNet (late fusion)"
# 3a. which mechanism limits trainability? 75-epoch ablated variants
run 0 75 "$LONG" "MedFusion -MMD"
run 0 75 "$LONG" "MedFusion -EPRL"
run 0 75 "$LONG" "MedFusion -DILR"
# 3b. third seed for the 25-epoch table
for v in "MedFusion (full EDRL)" "MedFusion -MMD" "MedFusion -EPRL" \
         "MedFusion -DILR" "Multi_ResNet (late fusion)"; do
  run 2 25 - "$v"
done
# 3c. second seed for the long-budget table
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 1 75 "$LONG" "$v"
done
echo "=== round-3b queue complete ==="
