"""Trainer with steps_per_call > 1: chunked scanned training end-to-end.

Chunking groups same-shape batches into one lax.scan call
(trainer.py `run_chunk`); this must not change what gets trained or
logged — every batch still contributes exactly one optimizer step and one
metrics row, leftovers fall back to single steps, and loss still drops.
"""

import json

import numpy as np
import pytest
import yaml

from tests.test_e2e_train import tiny_config

pytestmark = pytest.mark.slow


def test_chunked_trainer_runs_every_batch(tmp_path):
    from pharmaforge_tpu.config.load_from_config import (
        data_module_from_config, model_from_config)
    from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset
    from pharmaforge_tpu.training.trainer import Trainer

    config = tiny_config(tmp_path)
    # 10 samples / batch 4 -> 3 batches per split epoch; steps_per_call=2
    # exercises both a full chunk and a leftover single step
    config["training"]["steps_per_call"] = 2
    config["training"]["evaluation"]["sample_interval"] = 0  # keep it fast
    make_synthetic_processed_dataset(config["dataset"]["processed_data_dir"],
                                     n_splits=3, samples_per_split=10,
                                     n_prot_range=(30, 80), seed=2)

    run_dir = tmp_path / "runs" / "run_chunked"
    run_dir.mkdir(parents=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)

    trainer = Trainer(config, run_dir, seed=0)
    trainer.fit(model_from_config(config), data_module_from_config(config))

    # per-bucket batching sets the per-epoch batch count (partial batches
    # per size bucket), so derive the expectation from the loader itself
    dm = data_module_from_config(config)
    dm.setup("fit")
    n_batches = len(dm.train_dataloader(seed=0))
    expected = 2 * n_batches

    rows = [json.loads(line) for line in
            (run_dir / "metrics.jsonl").read_text().strip().split("\n")]
    train_rows = [r for r in rows if "train total loss" in r]
    assert len(train_rows) == expected
    assert [r["step"] for r in train_rows] == sorted(
        {r["step"] for r in train_rows})
    assert all(np.isfinite(r["train total loss"]) for r in train_rows)
    # the model actually trained
    assert (np.mean([r["train total loss"] for r in train_rows[-3:]])
            < np.mean([r["train total loss"] for r in train_rows[:3]]))
    assert trainer.global_step == expected
