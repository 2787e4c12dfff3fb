#!/bin/bash
# Round-3 overtime queue, rev E — resumes after a host reboot wiped /tmp
# (compile cache + rev-D deadline file).  Landed so far (jsonl): long-budget
# 75-epoch table complete at seeds 0-1, seed 2 has full/late/-MMD.
# Order of value:
#   1. Seed-2 -EPRL / -DILR rows  -> completes n=3 for the WHOLE long table.
#   2. Warmup diagnostic (rev-D item 1, never ran): plateau seed 1 with
#      100-step linear warmup, then converged-seed-0 control.  Separate
#      output + state_dir so nonzero warmup never mixes with headlines.
#   3. Seed 3 of the five 75-epoch variants (toward n=4).
# Restart-safe (protocol-keyed jsonl resume), deadline-guarded.
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
# 1. complete seed 2 of the 75-epoch table (n=3 across all five variants)
run 2 75 "$LONG" "MedFusion -EPRL"
run 2 75 "$LONG" "MedFusion -DILR"
# 2. warmup diagnostic: the plateau seed first, then the control seed
run 1 75 "$WARM" "MedFusion (full EDRL)" \
  --warmup_steps 100 --state_dir /tmp/ablation_states_warmup
run 0 75 "$WARM" "MedFusion (full EDRL)" \
  --warmup_steps 100 --state_dir /tmp/ablation_states_warmup
# 3. seed 3 of the 75-epoch table, headline pair first
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  run 3 75 "$LONG" "$v"
done
echo "=== round-3e queue complete ==="
