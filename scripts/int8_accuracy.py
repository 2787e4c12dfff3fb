"""Accuracy delta of W8A8 int8 serving vs the bf16 eval path.

Loads a checkpoint, runs the val split through ``serve.Predictor`` twice
(bf16 and int8), and prints both metric rows plus probability deltas — the
honest-measurement companion to ``scripts/bench_int8.py`` (which measures
throughput on random weights).

    python scripts/int8_accuracy.py --checkpoint /tmp/ckpt/synthetic_0.5_x/best \
        --dataset synthetic --synthetic_samples 64 --batch_size 8
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    from edrl_tpu.cli.train import build_parser, config_from_args, make_loaders

    parser = build_parser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--min_dim", type=int, default=128)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    import os

    from edrl_tpu.serve import Predictor
    from edrl_tpu.train.metrics import compute_epoch_metrics
    from edrl_tpu.train.trainer import _dequantize

    directory, name = os.path.split(args.checkpoint.rstrip("/"))
    _, val_loader = make_loaders(cfg)

    # Collect the val set once (low-noise view, same as make_eval_step).
    import jax.numpy as jnp

    from edrl_tpu.data.device_noise import make_low_view_device

    @jax.jit
    def low_view(f, o):
        return make_low_view_device(
            _dequantize(f), _dequantize(o), cfg.data.noise, jax.random.key(123)
        )

    fundus_list, oct_list, labels = [], [], []
    for batch in val_loader.epoch(0):
        if "fundus" in batch:
            f, o = low_view(jnp.asarray(batch["fundus"]), jnp.asarray(batch["oct"]))
        else:
            f, o = batch["fundus_low"], batch["oct_low"]
        fundus_list.append(np.asarray(f))
        oct_list.append(np.asarray(o))
        labels.append(np.asarray(batch["label"]))
    fundus = np.concatenate(fundus_list)
    oct_vol = np.concatenate(oct_list)
    targets = np.concatenate(labels)

    rows = {}
    probs = {}
    for tag, kwargs in (
        ("bf16", {}),
        ("int8", {"quantize_int8": True, "min_dim": args.min_dim}),
    ):
        p = Predictor.from_checkpoint(cfg, directory or ".", name=name or None, **kwargs)
        probs[tag] = p.predict_probs(fundus, oct_vol)
        m = compute_epoch_metrics(targets, probs[tag], 0.0)
        rows[tag] = {
            "acc": round(m.accuracy, 4),
            "auc": round(m.auc, 4),
            "f1": round(m.f1, 4),
        }
        if tag == "int8":
            rows[tag]["dense_quantized"] = p.quant_report["dense_modules_quantized"]

    delta = np.abs(probs["bf16"] - probs["int8"])
    print(
        json.dumps(
            {
                "n": int(len(targets)),
                "bf16": rows["bf16"],
                "int8": rows["int8"],
                "top1_agreement": float(
                    (probs["bf16"].argmax(-1) == probs["int8"].argmax(-1)).mean()
                ),
                "mean_abs_prob_delta": round(float(delta.mean()), 5),
                "max_abs_prob_delta": round(float(delta.max()), 5),
            }
        )
    )


if __name__ == "__main__":
    main()
