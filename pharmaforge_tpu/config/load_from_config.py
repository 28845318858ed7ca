"""Factories: merged YAML config -> model / datamodule.

Parity with reference config_utils/load_from_config.py:6-43.
"""

from __future__ import annotations

from pharmaforge_tpu.data.datamodule import CrossdockedDataModule
from pharmaforge_tpu.models.diffusion import (
    DiffusionConfig,
    PharmacophoreDiffusion,
)


def model_from_config(config: dict) -> PharmacophoreDiffusion:
    cfg = DiffusionConfig.from_config(config)
    return PharmacophoreDiffusion(cfg)


def data_module_from_config(config: dict) -> CrossdockedDataModule:
    dataset_config = dict(config["dataset"])
    dataset_config["graph_cutoffs"] = config["graph"]["graph_cutoffs"]
    return CrossdockedDataModule(
        dataset_config=dataset_config,
        batch_size=config["training"]["batch_size"],
        num_workers=config["training"].get("num_workers", 0),
        validation_splits=config["training"]["validation_splits"])
