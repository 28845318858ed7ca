"""Train/val split management over the processed CrossDocked splits.

Parity with the reference `CrossdockedDataModule`
(dataset/protein_pharmacophore_datamodule.py:16-67) without the
PyTorch-Lightning dependency: validation splits are a user-chosen subset of
the three preprocessed split directories; the remainder trains.
"""

from __future__ import annotations

from typing import List

from pharmaforge_tpu.data.dataset import (
    BucketedLoader,
    ProteinPharmacophoreDataset,
    get_dataloader,
)


class CrossdockedDataModule:

    def __init__(self, dataset_config: dict, batch_size: int,
                 num_workers: int = 0, validation_splits: List[int] = []):
        self.dataset_config = dict(dataset_config)
        self.batch_size = batch_size
        self.num_workers = num_workers

        # the processed dataset ships as three split directories; validation
        # holds out a strict, non-empty subset and the rest trains
        held_out = set(validation_splits)
        all_splits = {0, 1, 2}
        if not held_out:
            raise NotImplementedError(
                "a validation hold-out is required: pick at least one of "
                "splits 0/1/2")
        if len(held_out) >= len(all_splits):
            raise ValueError(
                "cannot hold out every split for validation; leave at least "
                "one to train on")
        if not held_out <= all_splits:
            raise ValueError(
                f"validation_splits {sorted(held_out)} outside the available "
                f"splits {sorted(all_splits)}")

        self.train_split_idxs = sorted(all_splits - held_out)
        self.val_split_idxs = sorted(held_out)

        self.train_dataset = None
        self.val_dataset = None

    def setup(self, stage: str = "fit"):
        if stage == "fit":
            self.train_dataset = ProteinPharmacophoreDataset(
                name="train", split_idxs=self.train_split_idxs,
                **self.dataset_config)
            self.val_dataset = ProteinPharmacophoreDataset(
                name="val", split_idxs=self.val_split_idxs,
                **self.dataset_config)
        if stage == "test":
            self.val_dataset = ProteinPharmacophoreDataset(
                name="val", split_idxs=self.val_split_idxs,
                **self.dataset_config)

    def train_dataloader(self, seed: int = 0) -> BucketedLoader:
        return get_dataloader(self.train_dataset, self.batch_size, seed=seed)

    def val_dataloader(self, seed: int = 0) -> BucketedLoader:
        return get_dataloader(self.val_dataset, self.batch_size,
                              shuffle=False, seed=seed)
