"""Synthetic processed-dataset generator.

Writes a dataset in the exact on-disk format of the reference preprocessing
output (process_crossdocked.py:173-263) — per-split directories with
`prot_pharm_tensors.npz`, `prot_file_names.pkl.gz`, `lig_rdmol.pkl.gz` —
filled with random pocket geometry that carries a *learnable* complementarity
structure. Used for dev runs, the test suite, and benchmarking on machines
without CrossDocked2020 (the real pipeline is `process_crossdocked.py` at the
repo root).

Geometry + chemistry model:

* pocket atoms sit in a shell around a cavity center (pockets are roughly
  cavity-shaped), each with a random element;
* receptor pharmacophore sites are projections of selected pocket atoms
  toward the cavity, and their site type is a FIXED function of the source
  atom's element (`element_idx % 6`) — mirroring how real sites derive from
  residue chemistry via SMARTS;
* ground-truth pharmacophore centers are complementary by construction:
  each picks a receptor site, takes the complementary type
  (donor<->acceptor, +<->-, aromatic/hydrophobic self-paired), and sits
  within that type's matching distance of the site, displaced toward the
  cavity center.

Because the sites are a deterministic function of (pocket positions,
elements), the conditional distribution pharm | pocket has real structure a
model can learn — and the ground-truth validity metric
(analysis/metrics.py) is ~1.0 by construction, so train-time validity
climbing toward 1 measures genuine learning of receptor complementarity.
"""

from __future__ import annotations

import gzip
import pickle
from pathlib import Path

import numpy as np

# complementary pharm type for each receptor-site type, in PH_IDX_TO_TYPE
# index space [Aromatic, HDonor, HAcceptor, PositiveIon, NegativeIon,
# Hydrophobic] (constants.py): site Aromatic->pharm Aromatic, HDonor->
# HAcceptor, HAcceptor->HDonor, Positive->Negative, Negative->Positive,
# Hydrophobic->Hydrophobic. Consistent with analysis.metrics.MATCHING_TYPES.
SITE_TO_PHARM_TYPE = np.array([0, 2, 1, 4, 3, 5])
# matching distance per PHARM type (analysis.metrics.MATCHING_DISTANCE)
PHARM_TYPE_MAX_DIST = np.array([7.0, 4.0, 4.0, 5.0, 5.0, 5.0])


def _thin_points(pts: np.ndarray, min_dist: float) -> np.ndarray:
    """Greedy thinning: drop points closer than `min_dist` to an earlier
    kept point (heavy atoms never overlap in real structures)."""
    kept: list = []
    min_sq = min_dist * min_dist
    for p in pts:
        if not kept or np.min(np.sum((np.asarray(kept) - p) ** 2,
                                     axis=1)) >= min_sq:
            kept.append(p)
    return np.asarray(kept)


def make_synthetic_pocket(rng, center, n_prot, n_prot_elements=11):
    """Pocket atoms in a shell of radius 4-12 A around the cavity, thinned
    to a protein-like minimum heavy-atom spacing so local degree at the
    3.5 A pp cutoff stays realistic (~<= 14). Returns (positions, elements)."""
    dirs = rng.normal(size=(n_prot, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = rng.uniform(4.0, 12.0, size=(n_prot, 1))
    p_pos = (center + dirs * radii
             + rng.normal(scale=0.6, size=(n_prot, 3)))
    p_pos = _thin_points(p_pos, min_dist=1.7)
    p_elem = rng.integers(0, n_prot_elements, size=len(p_pos))
    return p_pos, p_elem


def make_sites_and_pharms(rng, center, p_pos, p_elem, n_pharm, n_prot_ph,
                          n_ph_types=6, site_rule="random"):
    """The conditional part of the generator: site selection + pharm
    placement given a fixed pocket. Exposed separately so the Bayes-optimal
    validity ceiling of the synthetic task can be measured by resampling
    this conditional for the SAME pocket (scripts/validity_ceiling.py):
    with site_rule='random' the site subset `src` is unobservable from the
    model's inputs (pocket atoms + elements only), so no pocket-conditioned
    model can beat a resample of this function evaluated against the
    original sites — measured ceiling ~0.65 (evidence/validity_ceiling/).

    site_rule='deterministic' instead derives BOTH the site count and the
    site atoms from the pocket alone (the atoms nearest the cavity center),
    making the sites fully inferable and pushing the task's validity
    ceiling to ~1.0 — the variant to use when validity should measure
    learning with real dynamic range.

    Returns (site_pos, site_type, pharm_pos, pharm_type)."""
    n_prot = len(p_pos)
    # receptor pharmacophore sites: projections of pocket atoms toward the
    # cavity; site type is a fixed function of element
    if site_rule == "deterministic":
        n_prot_ph = min(max(6, n_prot // 9), 40, n_prot)
        src = np.argsort(np.linalg.norm(p_pos - center, axis=1))[:n_prot_ph]
    elif site_rule == "random":
        n_prot_ph = min(n_prot_ph, n_prot)
        src = rng.choice(n_prot, size=n_prot_ph, replace=False)
    else:
        raise ValueError(f"unknown site_rule {site_rule!r}")
    toward = center - p_pos[src]
    toward /= np.linalg.norm(toward, axis=1, keepdims=True)
    q_pos = (p_pos[src] + 1.5 * toward
             + rng.normal(scale=0.3, size=(n_prot_ph, 3)))
    q_type = p_elem[src] % n_ph_types

    # ground-truth pharm centers: complementary to the sites nearest the
    # cavity center (where a ligand would sit)
    order = np.argsort(np.linalg.norm(q_pos - center, axis=1))
    pick = order[rng.integers(0, max(len(order) // 2, 1), size=n_pharm)]
    f_type = SITE_TO_PHARM_TYPE[q_type[pick]]
    inward = center - q_pos[pick]
    inward /= np.linalg.norm(inward, axis=1, keepdims=True)
    dist = rng.uniform(1.0, PHARM_TYPE_MAX_DIST[f_type] - 0.7)
    f_pos = (q_pos[pick] + dist[:, None] * inward
             + rng.normal(scale=0.2, size=(n_pharm, 3)))
    return q_pos, q_type, f_pos, f_type


def make_synthetic_processed_dataset(
        out_dir: str,
        n_splits: int = 3,
        samples_per_split: int = 32,
        n_prot_range=(60, 360),
        n_pharm_range=(3, 12),
        n_prot_ph_range=(6, 40),
        n_prot_elements: int = 11,
        n_ph_types: int = 6,
        seed: int = 0,
        site_rule: str = "random") -> Path:
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
            n_prot_ph = min(int(rng.integers(*n_prot_ph_range)), n_prot)

            p_pos, p_elem = make_synthetic_pocket(rng, center, n_prot,
                                                  n_prot_elements)
            q_pos, q_type, f_pos, f_type = make_sites_and_pharms(
                rng, center, p_pos, p_elem, n_pharm, n_prot_ph, n_ph_types,
                site_rule=site_rule)

            pharm_pos.append(f_pos.astype(np.float32))
            pharm_feat.append(f_type.astype(np.int32))
            prot_pos.append(p_pos.astype(np.float32))
            prot_feat.append(p_elem.astype(np.int32))
            prot_ph_pos.append(q_pos.astype(np.float32))
            prot_ph_feat.append(q_type.astype(np.float32))
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
