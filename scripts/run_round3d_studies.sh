#!/bin/bash
# Round-3 overtime queue, rev D — seed 3 of the 75-epoch long-budget table
# (ABLATION_FUSION_LONG.md), bringing the headline budget-effect comparison
# to n=4 to match the hard-protocol table's seed count.  Ordered by
# evidential value: the full-vs-late headline pair first, then the
# mechanism-attribution variants.  Restart-safe (jsonl resume),
# deadline-guarded like rev B/C.
set -u
cd "$(dirname "$0")/.."
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"
RUN_TIMEOUT="${RUN_TIMEOUT:-4500}"
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
    --variants "$variant" "${extra[@]}" || exit 1
}
LONG=ABLATION_FUSION_LONG.md
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 3 75 "$LONG" "$v"
done
echo "=== round-3d queue complete ==="
