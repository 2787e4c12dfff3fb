#!/bin/bash
# Round-5 TPU queue (VERDICT r4 items, in value order):
#   1. batch-128 static-int8 bench retry (r4 tunnel transport error) —
#      quick, closes the BASELINE.md "—" row (VERDICT weak #6).
#   2. Re-baseline the long-budget fusion table under the SHIPPED default
#      (warmup_steps=100) at n=4 for all five variants (VERDICT weak #1 /
#      next #2).  Output: ABLATION_FUSION_DEFAULT.md — its jsonl is seeded
#      from the round-4 warmup study's four full-EDRL rows (identical
#      protocol key), so only the remaining 16 (variant, seed) cells run.
#      Order: late fusion seeds 0-3 first (completes the headline pair at
#      n=4 under the shipped config), then the three ablated variants
#      seed-major (even n growth if the deadline trims the tail).
# Restart-safe (ablation jsonl resume + compile cache), deadline-guarded;
# every TPU process takes the advisory tpu_lock.
set -u -o pipefail  # without pipefail, `cmd | tee log` reports tee's status
                    # and a failed bench looks success-shaped (r5 review)
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
DEADLINE_FILE="${DEADLINE_FILE:-/tmp/study_deadline}"
RUN_TIMEOUT="${RUN_TIMEOUT:-7200}"
OUT=/tmp/r5_results
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

DEFAULT=ABLATION_FUSION_DEFAULT.md

# Seed the shipped-default study with the warmup probe's full-EDRL rows
# (same protocol key: fusion/75ep/warmup100); idempotent via the jsonl
# resume's (name, seed) dedup — but only copy rows that aren't there yet.
python - <<'EOF'
import json, os
src, dst = "ABLATION_FUSION_WARMUP.md.jsonl", "ABLATION_FUSION_DEFAULT.md.jsonl"
have = set()
if os.path.exists(dst):
    for line in open(dst):
        r = json.loads(line)
        have.add((r["name"], r["seed"]))
with open(dst, "a") as out:
    for line in open(src):
        r = json.loads(line)
        if (r["name"], r["seed"]) not in have:
            out.write(line)
            print("seeded:", r["name"], r["seed"])
EOF

abl() {
  local seed="$1" variant="$2"
  shift 2
  guard
  echo "--- ablation[default]: $variant s$seed ---"
  timeout "$RUN_TIMEOUT" python scripts/ablation_study.py \
    --protocol fusion --epochs 75 --seeds "$seed" \
    --variants "$variant" --output "$DEFAULT" \
    --warmup_steps 100 --state_dir /tmp/ablation_states_default || exit 1
}

bench() {  # bench <logname> <cmd...>  (failures logged, queue continues)
  local log="$1"; shift
  guard
  echo "--- bench: $* -> $OUT/$log ---"
  timeout "$RUN_TIMEOUT" "$@" 2>&1 | tee "$OUT/$log" || echo "(FAILED: $*)"
}

# 1. batch-128 static int8 retry
bench int8_b128.log python scripts/bench_int8.py --static --batch 128

# 2a. late fusion under the shipped default — headline pair to n=4 first
for s in 0 1 2 3; do
  abl "$s" "Multi_ResNet (late fusion)"
done

# 2b. ablated variants, seed-major for even n growth under the deadline
for s in 0 1 2 3; do
  for v in "MedFusion -MMD" "MedFusion -EPRL" "MedFusion -DILR"; do
    abl "$s" "$v"
  done
done

echo "=== round-5 queue complete ==="
