#!/bin/bash
# Round-3 overtime queue, rev C — reprioritized after the seed-0 75-epoch
# results landed (full EDRL 0.742 val acc == late fusion 0.742; fusion
# advantage +0.08 vs +0.02).  A SECOND SEED of that headline comparison is
# now worth more than the mechanism rows, so it runs first; the rest of
# rev B's plan follows.  Restart-safe (jsonl resume), deadline-guarded.
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
# 1. finish n=2 for the 25-epoch table (resumes; -DILR s1 may be cached)
run 1 25 - "MedFusion -DILR"
run 1 25 - "Multi_ResNet (late fusion)"
# 2. second seed of the 75-epoch headline comparison
run 1 75 "$LONG" "MedFusion (full EDRL)"
run 1 75 "$LONG" "Multi_ResNet (late fusion)"
# 3. which mechanism carries the budget effect? 75-epoch ablated variants
run 0 75 "$LONG" "MedFusion -MMD"
run 0 75 "$LONG" "MedFusion -EPRL"
run 0 75 "$LONG" "MedFusion -DILR"
# 4. third seed for the 25-epoch table
for v in "MedFusion (full EDRL)" "MedFusion -MMD" "MedFusion -EPRL" \
         "MedFusion -DILR" "Multi_ResNet (late fusion)"; do
  run 2 25 - "$v"
done
# 5. 75-epoch ablated variants, second seed
for v in "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 1 75 "$LONG" "$v"
done
# 6. third seed for the 75-epoch table
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 2 75 "$LONG" "$v"
done
echo "=== round-3c queue complete ==="
