"""Pharmacophore quality metrics.

Parity with the reference `SampleAnalyzer` / `compute_complementarity`
(analysis/metrics.py:7-86): the validity metric is the fraction of generated
centers lying within a type-specific distance of a *complementary* receptor
pharmacophore site. Numpy host-side — these run over small decoded samples,
not in the training hot path. The reference's `return_count=False` branch
raised a NameError (metrics.py:85); here it is implemented correctly.
"""

from __future__ import annotations

from typing import List

import numpy as np

from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
from pharmaforge_tpu.constants import PH_IDX_TO_TYPE

MATCHING_TYPES = {
    "Aromatic": ["Aromatic", "PositiveIon"],
    "HydrogenDonor": ["HydrogenAcceptor"],
    "HydrogenAcceptor": ["HydrogenDonor"],
    "PositiveIon": ["NegativeIon", "Aromatic"],
    "NegativeIon": ["PositiveIon"],
    "Hydrophobic": ["Hydrophobic"],
}

MATCHING_DISTANCE = {
    "Aromatic": 7,
    "Hydrophobic": 5,
    "HydrogenAcceptor": 4,
    "HydrogenDonor": 4,
    "NegativeIon": 5,
    "PositiveIon": 5,
}


def compute_complementarity(pharm_types: List[str], pharm_pos: np.ndarray,
                            prot_ph_types: List[str], prot_ph_pos: np.ndarray,
                            return_count: bool = False):
    """Fraction (or count) of generated centers near a complementary
    receptor site (reference metrics.py:53-86)."""
    pharm_pos = np.asarray(pharm_pos, dtype=np.float64)
    prot_ph_pos = np.asarray(prot_ph_pos, dtype=np.float64)

    if len(prot_ph_types) == 0 or len(pharm_types) == 0:
        return 0 if return_count else 0.0

    distances = np.linalg.norm(
        pharm_pos[:, None, :] - prot_ph_pos[None, :, :], axis=-1)
    ph_matching_distances = np.array(
        [MATCHING_DISTANCE[t] for t in pharm_types]).reshape(-1, 1)
    matching = np.array([[rec_type in MATCHING_TYPES[ph_type]
                          for rec_type in prot_ph_types]
                         for ph_type in pharm_types])

    mask = (distances <= ph_matching_distances) & matching
    complement_count = int(mask.any(axis=1).sum())

    if return_count:
        return complement_count
    return complement_count / len(pharm_types)


class SampleAnalyzer:

    def analyze(self, sample: List[SampledPharmacophore]) -> dict:
        """Validity over a set of samples (reference metrics.py:9-35).
        Each sample must carry its receptor pharmacophore sites."""
        valid_numerator = 0
        valid_denominator = 0
        for ph in sample:
            if ph.prot_ph_pos is None or ph.prot_ph_types is None:
                raise ValueError(
                    "sample lacks receptor pharmacophore sites (prot_ph); "
                    "validity is only computable for dataset pockets")
            n_valid = compute_complementarity(
                pharm_types=ph.ph_types, pharm_pos=ph.ph_coords,
                prot_ph_types=ph.prot_ph_types, prot_ph_pos=ph.prot_ph_pos,
                return_count=True)
            valid_numerator += n_valid
            valid_denominator += ph.n_ph_centers
        return {"validity": valid_numerator / max(valid_denominator, 1)}

    def analyze_per_type(self, sample: List[SampledPharmacophore]) -> dict:
        """EXTENSION beyond the reference: validity broken down by
        generated-center type. Returns {'validity_<Type>': fraction of
        generated <Type> centers that found a complementary receptor site,
        'count_<Type>': how many such centers were generated}. The overall
        'validity' from `analyze` is the count-weighted mean of these."""
        num = {t: 0 for t in MATCHING_TYPES}
        den = {t: 0 for t in MATCHING_TYPES}
        for ph in sample:
            if ph.prot_ph_pos is None or ph.prot_ph_types is None:
                raise ValueError(
                    "sample lacks receptor pharmacophore sites (prot_ph); "
                    "validity is only computable for dataset pockets")
            for i, t in enumerate(ph.ph_types):
                den[t] += 1
                num[t] += compute_complementarity(
                    pharm_types=[t], pharm_pos=ph.ph_coords[i:i + 1],
                    prot_ph_types=ph.prot_ph_types,
                    prot_ph_pos=ph.prot_ph_pos, return_count=True)
        out = {}
        for t in MATCHING_TYPES:
            out[f"validity_{t}"] = num[t] / max(den[t], 1)
            out[f"count_{t}"] = den[t]
        return out

    def pharm_feat_freq(self, sample: List[SampledPharmacophore]) -> np.ndarray:
        """Per-type counts over all sampled centers
        (reference metrics.py:37-51)."""
        type_counts = np.zeros(len(PH_IDX_TO_TYPE))
        for ph in sample:
            for val in ph.ph_feats_idxs:
                type_counts[int(val)] += 1
        return type_counts
