"""Padded dense mask-batched complex representation.

This replaces the reference's ragged DGL heterographs + `dgl.batch`
(dataset/protein_pharm_dataset.py:210-271) and the `copy_graph` pocket
replication machinery (utils/unorganized_utils.py:28-81). A batch is a pytree
of fixed-shape arrays; batching is a leading axis, variable sizes are
validity masks, and "N samples with different pharm sizes from one pocket"
(the core of batched generation) is pocket tiling + per-row pharm masks.

Static shapes are what lets the whole diffusion chain compile into a single
XLA program: pharm slots pad to a constant F (sizes are 3-8), protein slots
pad to size buckets so only a handful of program shapes ever compile.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.struct
import numpy as np

# default pharm slot count: dataset sizes are 3-8 centers
# (reference n_nodes_dist.py:14, configs/dev.yml:63-64)
DEFAULT_MAX_PHARM = 8


@flax.struct.dataclass
class PharmComplexBatch:
    """One batch of protein-pocket / pharmacophore complexes.

    pharm_x:    [B, F, 3]   pharmacophore center coordinates
    pharm_h:    [B, F, T]   one-hot pharmacophore types (T=6)
    pharm_mask: [B, F]      validity of pharm slots
    prot_x:     [B, P, 3]   pocket heavy-atom coordinates
    prot_h:     [B, P, E]   one-hot pocket elements (E=11)
    prot_mask:  [B, P]      validity of protein slots
    """

    pharm_x: np.ndarray
    pharm_h: np.ndarray
    pharm_mask: np.ndarray
    prot_x: np.ndarray
    prot_h: np.ndarray
    prot_mask: np.ndarray

    @property
    def batch_size(self) -> int:
        return self.pharm_x.shape[0]

    @property
    def n_pharm_slots(self) -> int:
        return self.pharm_x.shape[1]

    @property
    def n_prot_slots(self) -> int:
        return self.prot_x.shape[1]


def bucket_size(n: int, multiple: int = 64, minimum: int = 64) -> int:
    """Round a node count up to a padding bucket boundary.

    Buckets quantize protein sizes so XLA compiles only a few shapes
    (the TPU answer to the reference's fully dynamic graph sizes).
    """
    return max(minimum, ((n + multiple - 1) // multiple) * multiple)


def pad_to(arr: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    """Zero-pad `arr` along `axis` to length `n`."""
    pad = n - arr.shape[axis]
    if pad < 0:
        raise ValueError(f"cannot pad axis of size {arr.shape[axis]} down to {n}")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def collate_complexes(samples: Sequence[dict],
                      max_pharm: Optional[int] = None,
                      max_prot: Optional[int] = None,
                      prot_bucket_multiple: int = 64) -> PharmComplexBatch:
    """Collate per-sample dicts into one padded batch.

    Each sample dict holds numpy arrays: pharm_x [f,3], pharm_h [f,T],
    prot_x [p,3], prot_h [p,E]. Equivalent of `dgl.batch` over
    build_initial_complex_graph outputs (protein_pharm_dataset.py:268-271).
    """
    f_max = max_pharm or max(max(s["pharm_x"].shape[0] for s in samples),
                             DEFAULT_MAX_PHARM)
    p_raw = max(s["prot_x"].shape[0] for s in samples)
    p_max = max_prot or bucket_size(p_raw, prot_bucket_multiple)

    pharm_x, pharm_h, pharm_mask = [], [], []
    prot_x, prot_h, prot_mask = [], [], []
    for s in samples:
        f = s["pharm_x"].shape[0]
        p = s["prot_x"].shape[0]
        pharm_x.append(pad_to(np.asarray(s["pharm_x"], np.float32), f_max))
        pharm_h.append(pad_to(np.asarray(s["pharm_h"], np.float32), f_max))
        m = np.zeros(f_max, bool); m[:f] = True
        pharm_mask.append(m)
        prot_x.append(pad_to(np.asarray(s["prot_x"], np.float32), p_max))
        prot_h.append(pad_to(np.asarray(s["prot_h"], np.float32), p_max))
        m = np.zeros(p_max, bool); m[:p] = True
        prot_mask.append(m)

    return PharmComplexBatch(
        pharm_x=np.stack(pharm_x), pharm_h=np.stack(pharm_h),
        pharm_mask=np.stack(pharm_mask),
        prot_x=np.stack(prot_x), prot_h=np.stack(prot_h),
        prot_mask=np.stack(prot_mask),
    )


def stack_batches(batches: Sequence[PharmComplexBatch]) -> PharmComplexBatch:
    """Stack K same-shape batches on a new leading axis (for the scanned
    multi-step train call, training.train_state.make_multi_train_step)."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def tile_pocket(prot_x: np.ndarray, prot_h: np.ndarray,
                pharm_sizes: Sequence[int],
                n_pharm_feats: int = 6,
                max_pharm: Optional[int] = None,
                max_prot: Optional[int] = None,
                prot_bucket_multiple: int = 64) -> PharmComplexBatch:
    """Replicate one pocket into a batch with per-copy pharm node counts.

    Equivalent of `copy_graph(g, n_copies, pharm_feats_per_copy=...)` +
    `dgl.batch` (utils/unorganized_utils.py:28-81; pharmacodiff.py:540-556):
    pharm features start as zeros, the requested sizes become per-row masks.
    """
    pharm_sizes = list(int(s) for s in pharm_sizes)
    b = len(pharm_sizes)
    f_max = max_pharm or max(max(pharm_sizes), DEFAULT_MAX_PHARM)
    p = prot_x.shape[0]
    p_max = max_prot or bucket_size(p, prot_bucket_multiple)

    prot_x_pad = pad_to(np.asarray(prot_x, np.float32), p_max)
    prot_h_pad = pad_to(np.asarray(prot_h, np.float32), p_max)
    prot_mask = np.zeros(p_max, bool); prot_mask[:p] = True

    pharm_mask = np.zeros((b, f_max), bool)
    for i, sz in enumerate(pharm_sizes):
        if sz > f_max:
            raise ValueError(f"pharm size {sz} exceeds slot count {f_max}")
        pharm_mask[i, :sz] = True

    return PharmComplexBatch(
        pharm_x=np.zeros((b, f_max, 3), np.float32),
        pharm_h=np.zeros((b, f_max, n_pharm_feats), np.float32),
        pharm_mask=pharm_mask,
        prot_x=np.broadcast_to(prot_x_pad, (b, p_max, 3)).copy(),
        prot_h=np.broadcast_to(prot_h_pad, (b,) + prot_h_pad.shape).copy(),
        prot_mask=np.broadcast_to(prot_mask, (b, p_max)).copy(),
    )
