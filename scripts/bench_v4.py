"""Measure the v4 fused attention-sublayer kernel against the v2 baseline.

Runs the full-size dual-view train step (the bench.py program) in both
configurations on the TPU and prints a comparison line per point.  Run ONLY
when the TPU is free (one process at a time):

    python scripts/bench_v4.py            # batch 16 + 32
    python scripts/bench_v4.py --batches 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import bench_train_step  # noqa: E402  (sets compile cache)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)
    results = {}
    for b in args.batches:
        for name, kwargs in (
            ("v2 (fused attention cores)", {}),
            (
                "v4 (fused attention sublayer)",
                {"use_fused_block_attention": True},
            ),
        ):
            pps = bench_train_step(batch_size=b, steps=args.steps, **kwargs)
            results[f"b{b} {name}"] = round(pps, 1)
            print(
                json.dumps({"batch": b, "config": name, "pairs_per_sec": round(pps, 2)}),
                flush=True,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
