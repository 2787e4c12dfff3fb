#!/bin/bash
# End-of-round verify drive (the /verify recipe's TPU surfaces), run after
# the study queue's deadline passes and the chip frees:
#   1. cli.train  — 2-epoch full-size synthetic run, best-ckpt save
#   2. cli.test   — 10-metric suite + missing-modality sweep on that ckpt
#   3. entry()    — driver compile-check
#   4. bench.py   — one JSON line (waits for the advisory lock itself)
# Logs land in /tmp/r5_close/.
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
OUT=/tmp/r5_close
mkdir -p "$OUT"
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"

# Sleep until the queue deadline (it stops cleanly at its next guard), then
# wait for the advisory lock to free — returning between queue runs is not
# enough, the deadline is what guarantees no successor run starts.
if [ -f "$DEADLINE_FILE" ]; then
  d=$(cat "$DEADLINE_FILE")
  now=$(date +%s)
  if [ "$now" -lt "$d" ]; then
    echo "sleeping $((d - now))s until the study deadline ($d)"
    sleep "$((d - now))"
  fi
fi
python - <<'PY'
from edrl_tpu.utils import tpu_lock
free = tpu_lock.wait_until_free(timeout_s=5400.0, poll_s=30.0)
print("chip free:", free)
PY

echo "=== [1/4] cli.train verify ==="
timeout 3600 python -m edrl_tpu.cli.train --dataset synthetic --batch_size 8 \
  --end_epochs 2 --synthetic_samples 32 --lr 1e-4 \
  --checkpoint_dir /tmp/ckpt_r5v --log_dir /tmp/log_r5v --name verify \
  2>&1 | tee "$OUT/train.log" || echo "(cli.train FAILED)"

echo "=== [2/4] cli.test verify ==="
timeout 2400 python -m edrl_tpu.cli.test --dataset synthetic --batch_size 8 \
  --synthetic_samples 32 \
  --checkpoint /tmp/ckpt_r5v/synthetic_0.5_verify/best \
  2>&1 | tee "$OUT/test.log" || echo "(cli.test FAILED)"

echo "=== [3/4] entry compile-check ==="
timeout 2400 python __graft_entry__.py 2>&1 | tee "$OUT/entry.log" \
  || echo "(entry FAILED)"

echo "=== [4/4] bench ==="
timeout 3600 python bench.py 2>&1 | tee "$OUT/bench.log" \
  || echo "(bench FAILED)"

echo "=== round-5 close drive complete ==="
