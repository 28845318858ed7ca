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

        if len(validation_splits) == 0:
            raise NotImplementedError(
                "training without a validation split has not yet been implemented")
        if len(validation_splits) >= 3:
            raise ValueError(
                "validation split indices must be a subset of [0, 1, 2]")
        for split_idx in validation_splits:
            if split_idx not in [0, 1, 2]:
                raise ValueError("validation split index must be 0, 1, or 2")

        split_idxs = [0, 1, 2]
        self.train_split_idxs = [i for i in split_idxs
                                 if i not in validation_splits]
        self.val_split_idxs = [i for i in split_idxs if i in validation_splits]

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
