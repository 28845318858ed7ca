"""Synthetic processed-dataset generator.

Writes a dataset in the exact on-disk format of the reference preprocessing
output (process_crossdocked.py:173-263) — per-split directories with
`prot_pharm_tensors.npz`, `prot_file_names.pkl.gz`, `lig_rdmol.pkl.gz` —
filled with plausible random pocket/pharmacophore geometry. Used for dev
runs, the test suite, and benchmarking on machines without CrossDocked2020
(the real pipeline is `process_crossdocked.py` at the repo root).

Geometry model: pocket atoms are sampled inside a shell around the origin
(pockets are roughly cavity-shaped); pharmacophore centers and receptor
pharmacophore sites sit in/near the cavity so that distance-based graph
construction and complementarity metrics exercise realistic branch
behavior.
"""

from __future__ import annotations

import gzip
import pickle
from pathlib import Path

import numpy as np


def make_synthetic_processed_dataset(
        out_dir: str,
        n_splits: int = 3,
        samples_per_split: int = 32,
        n_prot_range=(60, 360),
        n_pharm_range=(3, 12),
        n_prot_ph_range=(6, 40),
        n_prot_elements: int = 11,
        n_ph_types: int = 6,
        seed: int = 0) -> Path:
    out = Path(out_dir)
    rng = np.random.default_rng(seed)
    for split in range(n_splits):
        split_dir = out / f"it2_tt_v1.3_0_test{split}"
        split_dir.mkdir(parents=True, exist_ok=True)

        pharm_pos, pharm_feat = [], []
        prot_pos, prot_feat = [], []
        prot_ph_pos, prot_ph_feat = [], []
        names = []
        for i in range(samples_per_split):
            center = rng.normal(scale=30.0, size=3)
            n_prot = int(rng.integers(*n_prot_range))
            n_pharm = int(rng.integers(*n_pharm_range))
            n_prot_ph = int(rng.integers(*n_prot_ph_range))

            # pocket atoms in a shell of radius 4-12 A around the cavity
            dirs = rng.normal(size=(n_prot, 3))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            radii = rng.uniform(4.0, 12.0, size=(n_prot, 1))
            p_pos = center + dirs * radii + rng.normal(scale=0.6,
                                                       size=(n_prot, 3))
            # pharm centers inside the cavity
            f_pos = center + rng.normal(scale=2.5, size=(n_pharm, 3))
            # receptor pharmacophore sites near the pocket surface
            q_idx = rng.integers(0, n_prot, size=n_prot_ph)
            q_pos = p_pos[q_idx] + rng.normal(scale=1.0, size=(n_prot_ph, 3))

            pharm_pos.append(p := f_pos.astype(np.float32))
            pharm_feat.append(rng.integers(0, n_ph_types,
                                           size=n_pharm).astype(np.int32))
            prot_pos.append(p_pos.astype(np.float32))
            prot_feat.append(rng.integers(0, n_prot_elements,
                                          size=n_prot).astype(np.int32))
            prot_ph_pos.append(q_pos.astype(np.float32))
            prot_ph_feat.append(rng.integers(0, n_ph_types,
                                             size=n_prot_ph).astype(np.float32))
            names.append(f"synthetic/pocket_{split}_{i}.pdb")

        def spans(arrs):
            n = np.array([len(a) for a in arrs])
            idx = np.zeros((len(arrs), 2), dtype=int)
            idx[:, 1] = np.cumsum(n)
            idx[1:, 0] = idx[:-1, 1]
            return idx

        np.savez_compressed(
            split_dir / "prot_pharm_tensors.npz",
            prot_pos=np.concatenate(prot_pos),
            prot_feat=np.concatenate(prot_feat),
            prot_idx=spans(prot_pos),
            pharm_pos=np.concatenate(pharm_pos),
            pharm_feat=np.concatenate(pharm_feat),
            pharm_idx=spans(pharm_pos),
            prot_ph_pos=np.concatenate(prot_ph_pos),
            prot_ph_feat=np.concatenate(prot_ph_feat),
            prot_ph_idx=spans(prot_ph_pos),
        )
        with gzip.open(split_dir / "prot_file_names.pkl.gz", "wb") as f:
            pickle.dump(names, f)
        with gzip.open(split_dir / "lig_rdmol.pkl.gz", "wb") as f:
            pickle.dump([None] * samples_per_split, f)
    return out
