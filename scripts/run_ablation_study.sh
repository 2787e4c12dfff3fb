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
for seed in $SEEDS; do
  for v in "MedFusion (full EDRL)" "MedFusion -MMD" "MedFusion -EPRL" \
           "MedFusion -DILR" "Multi_ResNet (late fusion)"; do
    echo "--- driving: $v s$seed ---"
    timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
      --epochs "$EPOCHS" --seeds "$seed" --variants "$v" \
      --protocol "$PROTOCOL" || exit 1
  done
done
