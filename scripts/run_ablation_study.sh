#!/bin/bash
# Drive the ablation study one (variant, seed) per PROCESS: a single-process
# multi-run study leaks ~30 GB host RSS per full-size run (OOM-killed at
# 128 GB mid-study on 2026-08-17).  Each invocation resumes from the .jsonl
# (finished runs skip instantly) and re-renders ABLATION.md, so this loop is
# idempotent and restart-safe.
set -u
cd "$(dirname "$0")/.."
EPOCHS="${EPOCHS:-25}"
SEEDS="${SEEDS:-0 1 2}"
PROTOCOL="${PROTOCOL:-hard}"
# Cold /tmp/jax_comp_cache rounds pay a 15-25 min AOT compile on the first
# run of each distinct program; 5400 s only fits that plus training when the
# cache is warm, so the budget is overridable.
RUN_TIMEOUT="${RUN_TIMEOUT:-5400}"
# Deadline guard: if DEADLINE_FILE holds an epoch-seconds timestamp, no NEW
# run starts after it (in-flight runs finish and their row still lands in the
# .jsonl).  Lets a detached multi-hour queue yield the single TPU cleanly
# before something else (e.g. end-of-round benchmarking) needs it; the
# deadline can be moved by rewriting the file while the queue runs.
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"
past_deadline() {
  [ -f "$DEADLINE_FILE" ] || return 1
  local d now
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || return 1
  now=$(date +%s)
  [ -n "$d" ] && [ "$now" -ge "$d" ]
}
for seed in $SEEDS; do
  for v in "MedFusion (full EDRL)" "MedFusion -MMD" "MedFusion -EPRL" \
           "MedFusion -DILR" "Multi_ResNet (late fusion)"; do
    if past_deadline; then
      echo "--- deadline ($(cat "$DEADLINE_FILE")) passed; stopping cleanly ---"
      exit 3
    fi
    echo "--- driving: $v s$seed ---"
    timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
      --epochs "$EPOCHS" --seeds "$seed" --variants "$v" \
      --protocol "$PROTOCOL" || exit 1
  done
done
