#!/bin/bash
# Round-3 overtime queue, rev D — runs after rev C's seed-2 rows land.
#
# 1. Warmup diagnostic (ABLATION_FUSION_WARMUP.md): the long-budget table
#    found seeds where full EDRL's train loss never leaves its initial
#    plateau (seed 1: loss ~2.0 after 75 epochs, val 0.562).  Re-run that
#    exact seed with linear LR warmup (100 steps ~ 6 epochs of the 1200-step
#    budget) — if it now descends, the plateau is an optimization artifact
#    the standard tooling fixes, not an architecture property.  Seed 0
#    (which converged without warmup) is the does-no-harm control.
#    Separate output file: nonzero warmup enters the protocol key and must
#    never mix with the headline tables.  Separate state_dir: the post-hoc
#    sweep state slug is (variant, seed) only.
# 2. Seed 3 of the 75-epoch headline pair, then the ablated variants,
#    bringing the budget-effect table toward n=4.
#
# Restart-safe (jsonl resume), deadline-guarded like rev B/C.
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
  shift 4
  if past_deadline; then
    echo "--- deadline ($(cat "$DEADLINE_FILE")) passed; stopping cleanly ---"
    exit 3
  fi
  echo "--- driving: $variant s$seed ep$epochs out=$output $* ---"
  local extra=()
  [ "$output" != "-" ] && extra=(--output "$output")
  timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
    --protocol fusion --epochs "$epochs" --seeds "$seed" \
    --variants "$variant" ${extra[@]+"${extra[@]}"} "$@" || exit 1
}
LONG=ABLATION_FUSION_LONG.md
WARM=ABLATION_FUSION_WARMUP.md
# 1. warmup diagnostic: the plateau seed first, then the control seed
run 1 75 "$WARM" "MedFusion (full EDRL)" \
  --warmup_steps 100 --state_dir /tmp/ablation_states_warmup
run 0 75 "$WARM" "MedFusion (full EDRL)" \
  --warmup_steps 100 --state_dir /tmp/ablation_states_warmup
# 2. seed 3 of the 75-epoch table, headline pair first
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 3 75 "$LONG" "$v"
done
echo "=== round-3d queue complete ==="
