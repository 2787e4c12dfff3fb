"""Batch inference CLI — the serving path.

Loads a checkpoint and scores samples (GAMMA-layout directory or synthetic),
emitting one JSON line per sample with class probabilities, the predicted
grade, and confidence — plus a summary line with throughput.  This is the
deployment surface the reference never had (its ``fusion_test.py`` only
printed aggregate metrics).

    python -m edrl_tpu.cli.predict --dataset dr2 --data_path ... \
        --label_file ... --checkpoint ckpt/best --output preds.jsonl
"""

from __future__ import annotations

import json
import time

import numpy as np

from edrl_tpu.cli.train import _enable_compile_cache, build_parser, config_from_args


def main(argv=None):
    _enable_compile_cache()
    parser = build_parser()
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--output", default="", help="JSONL output path (default stdout)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    import jax

    from edrl_tpu.cli.train import make_loaders
    from edrl_tpu.train.checkpoint import CheckpointManager
    from edrl_tpu.train.trainer import (
        _dequantize,
        _normalize_output,
        init_state,
        make_model,
    )

    _, val_loader = make_loaders(cfg)
    model, state = init_state(cfg, cfg.train.seed)
    if args.checkpoint:
        import os

        directory, name = os.path.split(args.checkpoint.rstrip("/"))
        state = CheckpointManager(directory or ".").restore(state, name)

    @jax.jit
    def predict(state, fundus, oct_vol):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            _dequantize(fundus),
            _dequantize(oct_vol),
            None,
            train=False,
        )
        logits = _normalize_output(out)[0]
        return jax.nn.softmax(logits, axis=-1)

    sink = open(args.output, "w") if args.output else None
    emit = (lambda s: sink.write(s + "\n")) if sink else print
    n = 0
    t0 = time.perf_counter()
    for batch in val_loader.epoch(0):
        fundus = batch.get("fundus", batch.get("fundus_low"))
        oct_vol = batch.get("oct", batch.get("oct_low"))
        probs = np.asarray(predict(state, fundus, oct_vol))
        for i in range(len(probs)):
            emit(
                json.dumps(
                    {
                        "index": n + i,
                        "probs": [round(float(p), 6) for p in probs[i]],
                        "grade": int(probs[i].argmax()),
                        "confidence": round(float(probs[i].max()), 6),
                    }
                )
            )
        n += len(probs)
    dt = time.perf_counter() - t0
    if sink:
        sink.close()
    print(
        json.dumps(
            {"samples": n, "seconds": round(dt, 3), "pairs_per_sec": round(n / dt, 2)}
        )
    )


if __name__ == "__main__":
    main()
