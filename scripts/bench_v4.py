"""One-off: measure the v4 fused attention-sublayer kernel vs the default path.

VERDICT round-2 item 2 (math-level fusion: LN/residual/qkv/proj folded into
the attention kernel, `kernels/block_attention.py`) demands a measured
number either way.  Runs the flagship dual-view train step at batch 16
with and without `use_fused_block_attention` and prints one JSON line per
config.  Results land in BASELINE.md's history / negatives table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import bench_train_step, bench_infer_step  # noqa: E402  (sets cache dirs)


def main():
    configs = [
        ("default", {}),
        ("v4_fused_block_attention", {"use_fused_block_attention": True}),
    ]
    for name, kw in configs:
        t0 = time.time()
        pairs = bench_train_step(**kw)
        print(
            json.dumps(
                {
                    "config": name,
                    "train_pairs_per_sec": round(pairs, 2),
                    "wall_s": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
