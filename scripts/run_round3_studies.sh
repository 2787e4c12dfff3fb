#!/bin/bash
# Round-3 held-out-val evidence runs, in priority order, one TPU process at a
# time.  Both studies are jsonl-resumable, so this wrapper is restart-safe.
set -u
cd "$(dirname "$0")/.."
echo "=== hard protocol (robustness evidence), seeds 0-3 ==="
EPOCHS=25 SEEDS="0 1 2 3" PROTOCOL=hard RUN_TIMEOUT=7200 \
  bash scripts/run_ablation_study.sh || exit 1
echo "=== fusion protocol (clean-accuracy fusion advantage), seeds 0-2 ==="
EPOCHS=25 SEEDS="0 1 2" PROTOCOL=fusion RUN_TIMEOUT=7200 \
  bash scripts/run_ablation_study.sh || exit 1
echo "=== all studies complete ==="
