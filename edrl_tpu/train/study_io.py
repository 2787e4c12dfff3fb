"""Shared jsonl loading for the ablation/analysis tools.

One implementation of the "restrict to the most recent protocol" rule that
``scripts/ablation_claims.py``, ``scripts/ablation_generalization_gap.py``
and ``scripts/ablation_budget_gap.py`` previously each carried a copy of.
A study .jsonl accumulates rows across re-runs; rows whose per-row
``protocol`` tag differs from the newest row's belong to an older sweep
grid / sample count and must not be aggregated with the current study
(silently mixing them is exactly what the tag exists to prevent — see
``scripts/ablation_study.py``'s protocol-keyed resume).
"""

from __future__ import annotations

import json


def load_protocol_rows(path: str, warn: bool = False) -> list:
    """Rows of the most recent protocol in ``path``, oldest first.

    Legacy rows (round-2 archives) predate the ``seed`` field; it is
    normalized to 0 here so callers can index ``r["seed"]`` directly.
    """
    raw = [json.loads(line) for line in open(path)]
    current = raw[-1].get("protocol") if raw else None
    rows = []
    dropped = 0
    for r in raw:
        if r.get("protocol") != current:
            dropped += 1
            continue
        r.setdefault("seed", 0)
        rows.append(r)
    if dropped and warn:
        import sys

        print(
            f"(note: {dropped} row(s) from other protocols in {path} "
            "excluded; aggregating the most recent protocol only)",
            file=sys.stderr,
        )
    return rows


def load_by_name_seed(path: str, warn: bool = False) -> dict:
    """``{(name, seed): row}`` over the current-protocol rows."""
    return {(r["name"], r["seed"]): r for r in load_protocol_rows(path, warn)}
