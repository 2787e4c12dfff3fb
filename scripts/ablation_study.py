"""Hard-synthetic ablation study: what does each EDRL mechanism buy?

Trains on the HARD synthetic protocol (weak, modality-split, noise-buried
class signal — ``edrl_tpu/data/synthetic.py::HardSyntheticGammaDataset``)
where clean linear separation fails, then evaluates every model on the
sigma x modality robustness grid:

- MedFusion (full EDRL)
- MedFusion without MK-MMD self-distillation (``mmd_weight=0``)
- MedFusion without EPRL proxy losses (``proxy_weight_*=0``)
- MedFusion without DILR loss (``dilr_weight=0``)
- Multi_ResNet (plain late fusion, the reference's strongest simple baseline)

Writes a markdown results table to ABLATION.md and prints it.  This is the
evidence for the paper's robustness claim (reference README.md:2; noise grid
``fusion_train.py:548``) that the easy synthetic task cannot provide.

Run on the TPU (full-size backbones):

    python scripts/ablation_study.py --epochs 30 --train_samples 256
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edrl_tpu.config import DataConfig, EDRLConfig, ModelConfig, TrainConfig
from edrl_tpu.data import BatchLoader, HardSyntheticGammaDataset
from edrl_tpu.train.robustness import noise_sweep
from edrl_tpu.train.trainer import fit


def base_config(args) -> EDRLConfig:
    return EDRLConfig(
        data=DataConfig(
            dataset="synthetic_hard",
            batch_size=args.batch_size,
            eval_batch_size=args.batch_size,
            num_synthetic_samples=args.train_samples,
            device_noise=True,
            fundus_size=args.fundus_size,
            oct_size=(args.oct_size,) * 3,
        ),
        model=ModelConfig(use_bfloat16=True),
        train=TrainConfig(
            lr=args.lr,
            end_epochs=args.epochs,
            log_dir="",
            checkpoint_dir="",
            # One jitted lax.scan per 16-batch chunk: per-batch dispatch over
            # the tunnel caps training at ~6-20 pairs/s vs the device's 154.
            scan_batches=args.scan_batches,
        ),
    )


def variant(cfg: EDRLConfig, name: str) -> EDRLConfig:
    m, t = cfg.model, cfg.train
    if name == "MedFusion (full EDRL)":
        return cfg
    if name == "MedFusion -MMD":
        return cfg.replace(train=dataclasses.replace(t, mmd_weight=0.0))
    if name == "MedFusion -EPRL":
        return cfg.replace(
            model=dataclasses.replace(
                m, proxy_weight_train=0.0, proxy_weight_eval=0.0
            )
        )
    if name == "MedFusion -DILR":
        return cfg.replace(model=dataclasses.replace(m, dilr_weight=0.0))
    if name == "Multi_ResNet (late fusion)":
        return cfg.replace(model=dataclasses.replace(m, model_name="Multi_ResNet"))
    raise ValueError(name)


VARIANTS = (
    "MedFusion (full EDRL)",
    "MedFusion -MMD",
    "MedFusion -EPRL",
    "MedFusion -DILR",
    "Multi_ResNet (late fusion)",
)


def run_variant(name: str, cfg: EDRLConfig, args):
    vcfg = variant(cfg, name)
    val_cfg = dataclasses.replace(
        vcfg.data, num_synthetic_samples=args.val_samples
    )
    train_ds = HardSyntheticGammaDataset(vcfg.data, mode="train")
    val_ds = HardSyntheticGammaDataset(val_cfg, mode="val")
    train_loader = BatchLoader(
        train_ds, vcfg.data.batch_size, shuffle=True, drop_last=True, seed=0,
        uint8_transport=True,
    )
    val_loader = BatchLoader(
        val_ds, vcfg.data.eval_batch_size, shuffle=False, drop_last=False,
        uint8_transport=True,
    )
    t0 = time.time()
    state, result = fit(vcfg, train_loader, val_loader, verbose=args.verbose)
    train_time = time.time() - t0
    if args.state_dir:
        # Persist the swept state: sweeps can then be re-run post-hoc
        # (different sigmas, fixed bugs) without retraining the variant.
        from edrl_tpu.train.checkpoint import CheckpointManager

        slug = name.replace(" ", "_").replace("(", "").replace(")", "")
        CheckpointManager(os.path.join(args.state_dir, slug)).save(
            state, name="final"
        )
    sweep_cfg = vcfg.replace(data=val_cfg)
    sweep = noise_sweep(sweep_cfg, state, sigmas=args.sigmas)
    return {
        "name": name,
        "best_val_acc": result.best_acc,
        "final_train_loss": result.train_history[-1].loss,
        "train_time_s": round(train_time, 1),
        "sweep": sweep,
    }


def to_markdown(rows, sigmas) -> str:
    lines = [
        "# Hard-synthetic ablation study",
        "",
        "Protocol: `HardSyntheticGammaDataset` (weak modality-split signal, "
        "signal-dropout 0.3, distractors; dual-view training with "
        "gaussian_high=0.5).  Cells are `accuracy/AUC` of the final-epoch "
        "state on the sigma-corrupted low view (AUC is the headline: the "
        "hard protocol drives some variants to a degenerate argmax while "
        "their ranking stays informative).",
        "",
    ]
    header = "| model | val acc |"
    sep = "|---|---|"
    for m in ("both", "fundus-only", "oct-only"):
        for s in sigmas:
            header += f" {m} σ={s} |"
            sep += "---|"
    lines += [header, sep]
    for r in rows:
        row = f"| {r['name']} | {r['best_val_acc']:.3f} |"
        for m in ("both", "fundus-only", "oct-only"):
            for s in sigmas:
                cell = r["sweep"][m][s]
                row += f" {cell['accuracy']:.2f}/{cell['auc']:.2f} |"
        lines.append(row)
    lines += [
        "",
        f"Generated by scripts/ablation_study.py; "
        f"train_time_s: "
        + ", ".join(f"{r['name']}={r['train_time_s']}" for r in rows),
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--train_samples", type=int, default=256)
    p.add_argument("--val_samples", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--fundus_size", type=int, default=384)
    p.add_argument("--oct_size", type=int, default=96)
    p.add_argument("--sigmas", type=float, nargs="+", default=[0.0, 0.25, 0.5])
    p.add_argument("--scan_batches", type=int, default=16)
    p.add_argument("--state_dir", default="/tmp/ablation_states")
    p.add_argument("--variants", nargs="+", default=None)
    p.add_argument("--output", default="ABLATION.md")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    args.sigmas = tuple(args.sigmas)

    cfg = base_config(args)
    # Incremental persistence: each variant's full record (sweep included)
    # lands in a .jsonl next to the output as soon as it finishes, and
    # already-recorded variants are skipped on re-run — a multi-hour study
    # survives timeouts/restarts without retraining finished variants.
    jsonl = args.output + ".jsonl"
    rows = []
    done = set()
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                r = json.loads(line)
                # JSON stringifies the float sigma keys; restore them.
                r["sweep"] = {
                    m: {float(s): v for s, v in cells.items()}
                    for m, cells in r["sweep"].items()
                }
                rows.append(r)
                done.add(r["name"])
    for name in args.variants or VARIANTS:
        if name in done:
            print(f"=== {name} === (cached in {jsonl})", flush=True)
            continue
        print(f"=== {name} ===", flush=True)
        r = run_variant(name, cfg, args)
        rows.append(r)
        with open(jsonl, "a") as f:
            f.write(json.dumps(r, default=float) + "\n")
        print(json.dumps({k: v for k, v in r.items() if k != "sweep"}, default=float), flush=True)

    md = to_markdown(rows, args.sigmas)
    with open(args.output, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    sys.exit(main())
