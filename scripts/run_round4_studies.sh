#!/bin/bash
# Round-4 TPU queue (VERDICT r3 items, in value order):
#   1. Warmup coverage for the flagship convergence fix (#2): full EDRL
#      + 100-step warmup at 75 epochs on seeds 0 (does-no-harm control),
#      2, 3 — seed 1 (the plateau seed) already landed in round 3
#      (val 0.75, train loss 1.80).  Separate WARMUP output; nonzero
#      warmup is protocol-keyed so rows never mix with headline tables.
#   2. Static-calibration int8 measured (#4): bench_int8 --static at
#      batch 16 and serving-realistic 64/128, numerics out-of-sample.
#   3. Serving-latency SLO rows (#9): p50/p95 at batch 1/4/16 for
#      bf16, dynamic int8, static int8.
#   4. int8 accuracy deltas on a TRAINED checkpoint (10-epoch synthetic).
#   5. Long-budget seed-3 rows toward n=4 (headline pair first).
# Restart-safe (ablation jsonl resume + compile cache), deadline-guarded;
# every TPU process takes the advisory tpu_lock.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"
RUN_TIMEOUT="${RUN_TIMEOUT:-7200}"
OUT=/tmp/r4_results
mkdir -p "$OUT"

past_deadline() {
  [ -f "$DEADLINE_FILE" ] || return 1
  local d now
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || return 1
  now=$(date +%s)
  [ -n "$d" ] && [ "$now" -ge "$d" ]
}

guard() {
  if past_deadline; then
    echo "--- deadline ($(cat "$DEADLINE_FILE")) passed; stopping cleanly ---"
    exit 3
  fi
}

abl() {
  local seed="$1" epochs="$2" output="$3" variant="$4"
  shift 4
  guard
  echo "--- ablation: $variant s$seed ep$epochs out=$output $* ---"
  timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
    --protocol fusion --epochs "$epochs" --seeds "$seed" \
    --variants "$variant" --output "$output" "$@" || exit 1
}

bench() {  # bench <logname> <cmd...>  (failures logged, queue continues)
  local log="$1"; shift
  guard
  echo "--- bench: $* -> $OUT/$log ---"
  timeout "$RUN_TIMEOUT" "$@" 2>&1 | tee "$OUT/$log" || echo "(FAILED: $*)"
}

WARM=ABLATION_FUSION_WARMUP.md
LONG=ABLATION_FUSION_LONG.md

# 1. warmup coverage: control seed first, then 2 and 3
for s in 0 2 3; do
  abl "$s" 75 "$WARM" "MedFusion (full EDRL)" \
    --warmup_steps 100 --state_dir /tmp/ablation_states_warmup
done

# 2. static int8 throughput, out-of-sample numerics
bench int8_b16.log  python scripts/bench_int8.py --static --batch 16
bench int8_b64.log  python scripts/bench_int8.py --static --batch 64
bench int8_b128.log python scripts/bench_int8.py --static --batch 128

# 3. serving-latency SLO rows
bench latency_bf16.log        python scripts/bench_latency.py --batches 1 4 16
bench latency_int8.log        python scripts/bench_latency.py --int8 --batches 1 4 16
bench latency_int8_static.log python scripts/bench_latency.py --int8 --static --batches 1 4 16

# 4. int8 accuracy on a trained checkpoint (10-epoch full-size synthetic)
guard
CKPT=/tmp/r4_ckpt
if [ ! -d "$CKPT/synthetic_0.5_r4int8/best" ]; then
  echo "--- training the int8-accuracy checkpoint ---"
  timeout "$RUN_TIMEOUT" python -m edrl_tpu.cli.train \
    --dataset synthetic --batch_size 16 --end_epochs 10 \
    --synthetic_samples 256 --lr 3e-5 --scan_batches 16 \
    --checkpoint_dir "$CKPT" --log_dir /tmp/r4_log --name r4int8 \
    --mode train || echo "(ckpt train FAILED)"
fi
bench int8_accuracy.log python scripts/int8_accuracy.py \
  --checkpoint "$CKPT/synthetic_0.5_r4int8/best" \
  --dataset synthetic --synthetic_samples 256 --batch_size 16 \
  --static_calibrate 32

# 5. long-budget seed 3 toward n=4 (headline pair first, ablations after)
for v in "MedFusion (full EDRL)" "Multi_ResNet (late fusion)" \
         "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
  abl 3 75 "$LONG" "$v"
done

echo "=== round-4 queue complete ==="
