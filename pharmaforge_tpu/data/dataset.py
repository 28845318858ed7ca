"""CrossDocked processed-tensor dataset.

Loads the same on-disk format the reference produces and consumes
(process_crossdocked.py:173-263; dataset/protein_pharm_dataset.py:18-207):
per-split directories each holding

* ``prot_pharm_tensors.npz`` with flat arrays `pharm_pos`, `pharm_feat`,
  `prot_pos`, `prot_feat`, `prot_ph_pos`, `prot_ph_feat` plus `[start, end)`
  index arrays `pharm_idx` / `prot_idx` / `prot_ph_idx`;
* ``lig_rdmol.pkl.gz`` (pickled RDKit ligands — loaded only if rdkit is
  importable, kept as None otherwise since they are needed solely for
  writing reference SDF files during evaluation);
* ``prot_file_names.pkl.gz``.

Split directory names end in the split index (reference
protein_pharm_dataset.py:69). Unlike the reference, samples come back as
numpy dicts and batching produces padded dense `PharmComplexBatch` pytrees
(size-bucketed on the protein axis) instead of DGL graphs.
"""

from __future__ import annotations

import gzip
import pickle
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from pharmaforge_tpu.data.batch import (
    PharmComplexBatch,
    bucket_size,
    collate_complexes,
)
from pharmaforge_tpu.utils.relative_paths import fix_relative_path


class ProteinPharmacophoreDataset:

    def __init__(self,
                 name: str,
                 split_idxs: List[int],
                 raw_data_dir: str,
                 processed_data_dir: str,
                 graph_cutoffs: dict,
                 prot_elements: List[str],
                 ph_type_map: List[str],
                 subsample_pharms: bool = False,
                 subsample_min: int = 3,
                 subsample_max: int = 9,
                 seed: int = 0,
                 **kwargs):
        self.name = name
        self.graph_cutoffs = graph_cutoffs
        self.prot_elements = list(prot_elements)
        self.ph_type_map = list(ph_type_map)
        self.subsample_pharms = subsample_pharms
        self.subsample_min = subsample_min
        self.subsample_max = subsample_max
        self._rng = np.random.default_rng(seed)

        self.processed_data_dir = Path(processed_data_dir)
        if not self.processed_data_dir.exists():
            self.processed_data_dir = Path(fix_relative_path(processed_data_dir))
            if not self.processed_data_dir.exists():
                raise FileNotFoundError(
                    f"Could not find processed data directory at {self.processed_data_dir}")
        self.raw_data_dir = raw_data_dir
        if raw_data_dir and not Path(self.raw_data_dir).exists():
            fixed = fix_relative_path(raw_data_dir)
            if Path(fixed).exists():
                self.raw_data_dir = fixed

        pharm_pos, pharm_feat, prot_pos, prot_feat = [], [], [], []
        prot_ph_pos, prot_ph_feat = [], []
        pharm_spans, prot_spans, prot_ph_spans = [], [], []
        prot_file_names: List[str] = []
        lig_rdmol_objects: List[object] = []

        pharm_off = prot_off = prot_ph_off = 0
        for split_dir in sorted(self.processed_data_dir.iterdir()):
            if not split_dir.is_dir():
                continue
            try:
                split_idx = int(split_dir.name.split("_")[-1][-1])
            except ValueError:
                continue
            if split_idx not in split_idxs:
                continue

            names_file = split_dir / "prot_file_names.pkl.gz"
            if names_file.exists():
                with gzip.open(names_file, "rb") as f:
                    prot_file_names.extend(pickle.load(f))
            lig_file = split_dir / "lig_rdmol.pkl.gz"
            if lig_file.exists():
                try:
                    with gzip.open(lig_file, "rb") as f:
                        lig_rdmol_objects.extend(pickle.load(f))
                except Exception:
                    pass  # rdkit not importable: ligands only needed for eval IO

            data = np.load(split_dir / "prot_pharm_tensors.npz")
            pharm_pos.append(data["pharm_pos"])
            pharm_feat.append(data["pharm_feat"])
            prot_pos.append(data["prot_pos"])
            prot_feat.append(data["prot_feat"])
            prot_ph_pos.append(data["prot_ph_pos"])
            prot_ph_feat.append(data["prot_ph_feat"])
            pharm_spans.append(data["pharm_idx"] + pharm_off)
            prot_spans.append(data["prot_idx"] + prot_off)
            prot_ph_spans.append(data["prot_ph_idx"] + prot_ph_off)
            pharm_off += len(data["pharm_pos"])
            prot_off += len(data["prot_pos"])
            prot_ph_off += len(data["prot_ph_pos"])

        if not pharm_pos:
            raise FileNotFoundError(
                f"no split directories matching {split_idxs} under {self.processed_data_dir}")

        self.pharm_pos = np.concatenate(pharm_pos, axis=0).astype(np.float32)
        self.pharm_feat = np.concatenate(pharm_feat, axis=0)
        self.prot_pos = np.concatenate(prot_pos, axis=0).astype(np.float32)
        self.prot_feat = np.concatenate(prot_feat, axis=0)
        self.prot_ph_pos = np.concatenate(prot_ph_pos, axis=0).astype(np.float32)
        self.prot_ph_feat = np.concatenate(prot_ph_feat, axis=0)
        self.pharm_idx = np.concatenate(pharm_spans, axis=0)
        self.prot_idx = np.concatenate(prot_spans, axis=0)
        self.prot_ph_idx = np.concatenate(prot_ph_spans, axis=0)

        self.prot_file_names = prot_file_names
        self.lig_rdmol_objects = lig_rdmol_objects

    def __len__(self) -> int:
        return self.prot_idx.shape[0]

    def prot_size(self, i: int) -> int:
        s, e = self.prot_idx[i]
        return int(e - s)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        ps, pe = self.pharm_idx[i]
        rs, re = self.prot_idx[i]
        qs, qe = self.prot_ph_idx[i]

        pharm_pos = self.pharm_pos[ps:pe]
        pharm_t = self.pharm_feat[ps:pe].astype(np.int64)
        prot_pos = self.prot_pos[rs:re]
        prot_t = self.prot_feat[rs:re].astype(np.int64)
        prot_ph_pos = self.prot_ph_pos[qs:qe]
        prot_ph_t = self.prot_ph_feat[qs:qe].astype(np.int64)

        pharm_h = np.eye(len(self.ph_type_map), dtype=np.float32)[pharm_t]
        prot_h = np.eye(len(self.prot_elements), dtype=np.float32)[prot_t]
        prot_ph_h = np.eye(len(self.ph_type_map), dtype=np.float32)[prot_ph_t]

        # pharm-subset augmentation (reference
        # protein_pharm_dataset.py:158-168)
        if self.subsample_pharms and len(pharm_pos) > self.subsample_min - 1:
            sub_max = min(self.subsample_max, len(pharm_pos))
            if self.subsample_min == sub_max:
                n_centers = self.subsample_min
            else:
                n_centers = int(self._rng.integers(self.subsample_min,
                                                   sub_max + 1))
            sel = self._rng.choice(len(pharm_pos), size=n_centers,
                                   replace=False)
            pharm_pos = pharm_pos[sel]
            pharm_h = pharm_h[sel]

        return {
            "pharm_x": pharm_pos, "pharm_h": pharm_h,
            "prot_x": prot_pos, "prot_h": prot_h,
            "prot_ph_x": prot_ph_pos, "prot_ph_h": prot_ph_h,
        }

    def pack_batch(self, indices, max_pharm: int, max_prot: int
                   ) -> PharmComplexBatch:
        """Pack a batch straight from the flat arrays (native fast path).

        Equivalent to collating __getitem__ samples, but slicing + one-hot +
        padding run in the C++ packer (pharmaforge_tpu.native) over the flat
        preprocessed arrays — the host-side hot loop during training.
        """
        from pharmaforge_tpu import native

        indices = np.asarray(indices)
        prot_spans = self.prot_idx[indices].astype(np.int64)
        prot_x, prot_h, prot_mask = native.pack_batch(
            self.prot_pos, self.prot_feat.astype(np.int32), prot_spans,
            max_prot, len(self.prot_elements))

        pharm_spans = self.pharm_idx[indices].astype(np.int64)
        if self.subsample_pharms:
            # per-row subsample selections as a gather list
            idx_chunks, offsets = [], [0]
            for s, e in pharm_spans:
                n = int(e - s)
                if n > self.subsample_min - 1:
                    sub_max = min(self.subsample_max, n)
                    k = (self.subsample_min if self.subsample_min == sub_max
                         else int(self._rng.integers(self.subsample_min,
                                                     sub_max + 1)))
                    sel = s + self._rng.choice(n, size=k, replace=False)
                else:
                    sel = np.arange(s, e)
                idx_chunks.append(sel.astype(np.int64))
                offsets.append(offsets[-1] + len(sel))
            pharm_x, pharm_h, pharm_mask = native.pack_batch_gather(
                self.pharm_pos, self.pharm_feat.astype(np.int32),
                np.concatenate(idx_chunks), np.asarray(offsets, np.int64),
                max_pharm, len(self.ph_type_map))
        else:
            pharm_x, pharm_h, pharm_mask = native.pack_batch(
                self.pharm_pos, self.pharm_feat.astype(np.int32),
                pharm_spans, max_pharm, len(self.ph_type_map))

        return PharmComplexBatch(
            pharm_x=pharm_x, pharm_h=pharm_h, pharm_mask=pharm_mask,
            prot_x=prot_x, prot_h=prot_h, prot_mask=prot_mask)

    def get_files(self, idx: int):
        """Receptor filepath + rdkit ligand for a sample
        (reference protein_pharm_dataset.py:201-207)."""
        lig = self.lig_rdmol_objects[idx] if idx < len(self.lig_rdmol_objects) else None
        name = self.prot_file_names[idx] if idx < len(self.prot_file_names) else None
        return self.raw_data_dir, name, lig


def get_dataloader(dataset: ProteinPharmacophoreDataset, batch_size: int,
                   shuffle: bool = True, seed: int = 0,
                   max_pharm: Optional[int] = None,
                   prot_bucket_multiple: int = 64,
                   drop_last: bool = False) -> "BucketedLoader":
    return BucketedLoader(dataset, batch_size, shuffle=shuffle, seed=seed,
                          max_pharm=max_pharm,
                          prot_bucket_multiple=prot_bucket_multiple,
                          drop_last=drop_last)


class BucketedLoader:
    """Batches samples grouped by protein-size bucket.

    The TPU replacement for DGL's GraphDataLoader: every yielded batch is a
    fixed-shape `PharmComplexBatch`, and grouping by padded size keeps the
    number of distinct compiled program shapes to a handful while wasting
    little compute on padding.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, max_pharm: Optional[int] = None,
                 prot_bucket_multiple: int = 64, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        if max_pharm is None:
            # one static pharm-slot count for every batch: the subsample cap
            # when augmentation is on (larger sets are subsampled down to it,
            # smaller ones pass through below it), else the dataset-wide max
            if getattr(dataset, "subsample_pharms", False):
                max_pharm = int(dataset.subsample_max)
            else:
                max_pharm = int(np.max(dataset.pharm_idx[:, 1]
                                       - dataset.pharm_idx[:, 0]))
        self.max_pharm = max_pharm
        self.prot_bucket_multiple = prot_bucket_multiple
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._buckets: Dict[int, List[int]] = {}
        for i in range(len(dataset)):
            b = bucket_size(dataset.prot_size(i), prot_bucket_multiple)
            self._buckets.setdefault(b, []).append(i)

    def __len__(self) -> int:
        total = 0
        for idxs in self._buckets.values():
            n = len(idxs)
            total += n // self.batch_size
            if not self.drop_last and n % self.batch_size:
                total += 1
        return total

    def __iter__(self) -> Iterator[PharmComplexBatch]:
        batches = []
        for bucket, idxs in self._buckets.items():
            idxs = list(idxs)
            if self.shuffle:
                self._rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i:i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                batches.append((bucket, chunk))
        if self.shuffle:
            self._rng.shuffle(batches)
        for bucket, chunk in batches:
            if hasattr(self.dataset, "pack_batch"):
                yield self.dataset.pack_batch(chunk, max_pharm=self.max_pharm,
                                              max_prot=bucket)
            else:
                samples = [self.dataset[i] for i in chunk]
                yield collate_complexes(samples, max_pharm=self.max_pharm,
                                        max_prot=bucket)
