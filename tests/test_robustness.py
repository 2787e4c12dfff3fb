"""Noise-sweep robustness eval tests (BASELINE.json config 5)."""

import numpy as np

from edrl_tpu.config import tiny_test_config
from edrl_tpu.train.robustness import format_sweep, noise_sweep
from edrl_tpu.train.trainer import init_state


def test_noise_sweep_grid_runs():
    cfg = tiny_test_config(batch_size=4)
    _, state = init_state(cfg, 0)
    results = noise_sweep(cfg, state, sigmas=(0.0, 0.5), modalities=["both", "oct-only"])
    assert set(results) == {"both", "oct-only"}
    for modality in results:
        assert set(results[modality]) == {0.0, 0.5}
        for sigma, m in results[modality].items():
            assert 0.0 <= m["accuracy"] <= 1.0
            assert np.isfinite(m["loss"])
    table = format_sweep(results)
    assert "modality" in table and "oct-only" in table
