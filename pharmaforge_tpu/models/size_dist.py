"""Pharmacophore size sampling distribution.

Parity with the reference `PharmSizeDistribution` (models/n_nodes_dist.py)
whose dataset-driven mode was left unimplemented; here we implement it: when
a processed dataset is available we sample sizes from its empirical
pharmacophore-size histogram, otherwise fall back to the reference's uniform
U{3..8} (n_nodes_dist.py:13-14).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class PharmSizeDistribution:

    def __init__(self, dataset_dir: Optional[str] = None,
                 min_size: int = 3, max_size: int = 8, seed: int = 0):
        self.min_size = min_size
        self.max_size = max_size
        self._rng = np.random.default_rng(seed)
        self._sizes: Optional[np.ndarray] = None
        self._probs: Optional[np.ndarray] = None
        if dataset_dir is not None:
            self._try_load_histogram(Path(dataset_dir))

    def _try_load_histogram(self, dataset_dir: Path) -> None:
        if not dataset_dir.exists():
            return
        counts: list[int] = []
        for split_dir in sorted(dataset_dir.iterdir()):
            tensor_file = split_dir / "prot_pharm_tensors.npz"
            if not tensor_file.exists():
                continue
            try:
                data = np.load(tensor_file)
                idx = data["pharm_idx"]
                counts.extend((idx[:, 1] - idx[:, 0]).tolist())
            except Exception:
                continue
        if counts:
            arr = np.asarray(counts)
            arr = np.clip(arr, self.min_size, self.max_size)
            sizes, freq = np.unique(arr, return_counts=True)
            self._sizes = sizes
            self._probs = freq / freq.sum()

    def sample_uniformly(self, n_replicates: int) -> np.ndarray:
        """U{min_size..max_size} (reference n_nodes_dist.py:13-14)."""
        return self._rng.integers(self.min_size, self.max_size + 1,
                                  size=n_replicates)

    def sample(self, n_replicates: int) -> np.ndarray:
        """Empirical dataset distribution when available, else uniform."""
        if self._sizes is None:
            return self.sample_uniformly(n_replicates)
        return self._rng.choice(self._sizes, size=n_replicates, p=self._probs)

    def sample_variety(self, n_replicates: int) -> np.ndarray:
        """Cycle sizes min..max deterministically (the reference's intent at
        n_nodes_dist.py:16-24; its implementation was broken dead code)."""
        span = self.max_size - self.min_size + 1
        return self.min_size + (np.arange(n_replicates) % span)
