"""Static-shape neighbor construction inside jit.

TPU-native replacement for torch_cluster's `radius`, `radius_graph`, `knn`,
`knn_graph` (used by the reference at dynamics_gvp.py:187-227 for the dynamic
`ff`/`pf`/`fp` edges and protein_pharm_dataset.py:234-236 for the static `pp`
edges). Instead of variable-length CSR edge lists we produce:

* full boolean adjacency masks for edge types whose source or destination set
  is tiny (the pharmacophore has <= ~8 centers), and
* fixed-width top-K nearest-neighbor lists for the protein-protein edges
  (where all-pairs message materialization would waste HBM).

Edge-direction conventions are copied from the reference exactly
(messages flow src -> dst):

* ff  (pharm->pharm): radius r_ff around each pharm center, self excluded
  (`radius_graph`, dynamics_gvp.py:196), or k-nearest when ff_k>0.
* pf  (prot->pharm): radius mode connects every (prot, pharm) pair within
  r_pf (the reference caps at 100 pharms per *prot*, which never binds since
  there are <= 8 centers, dynamics_gvp.py:211); knn mode connects each pharm
  to its pf_k nearest prot atoms (dynamics_gvp.py:202-206).
* fp  (pharm->prot): exact reverse pairs of pf (dynamics_gvp.py:209,215).
* pp  (prot->prot): radius r_pp, up to `k_max` nearest neighbors per prot
  atom. The reference truncates at 100 in torch_cluster's arbitrary
  insertion order (protein_pharm_dataset.py:235); we keep the *nearest* K,
  which is a superset-quality selection at equal K and identical whenever the
  true degree is below K. pp distances are translation invariant, so this
  list is computed once per batch and reused across diffusion steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e30


def pairwise_sqdist(a, b):
    """Squared distances between two point sets. a:[...,N,3], b:[...,M,3] -> [...,N,M]."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


# below this k, k-pass extraction beats a full sort of the source axis
_ITERATIVE_TOPK_MAX = 8


def smallest_k(d2, k: int):
    """(values, indices) of the k smallest entries along the last axis,
    ascending, ties broken toward the lower index — exactly
    `lax.top_k(-d2, k)` negated.

    For small k this runs k argmin+mask passes instead of a full sort:
    XLA lowers top_k on TPU to a variadic sort of the whole axis, which
    profiling shows dominating the sampling step (a [B,F,P] sort every
    denoiser call for the pf knn), while k passes of (argmin, mask) are a
    few cheap reductions.
    """
    k = min(k, d2.shape[-1])
    if k > _ITERATIVE_TOPK_MAX:
        neg_v, idx = lax.top_k(-d2, k)
        return -neg_v, idx
    n = d2.shape[-1]
    cols = jnp.arange(n, dtype=jnp.int32)
    cur = d2
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        # disqualify the picked slot with +inf: invalid slots stay at the
        # finite _BIG sentinel, so exhausted passes walk them in index
        # order, matching top_k's distinct-index output exactly
        cur = jnp.where(cols == i[..., None], jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def radius_mask(dst_x, dst_mask, src_x, src_mask, r, exclude_self=False):
    """Dense adjacency: mask[b, i, j] = src j is a neighbor of dst i within r.

    Matches torch_cluster `radius` semantics (strict `<` comparison) with no
    per-destination cap.
    """
    d2 = pairwise_sqdist(dst_x, src_x)
    valid = dst_mask[..., :, None] & src_mask[..., None, :]
    adj = (d2 < r * r) & valid
    if exclude_self:
        n = adj.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        adj = adj & ~eye
    return adj


def knn_mask(dst_x, dst_mask, src_x, src_mask, k, exclude_self=False):
    """Dense adjacency selecting the k nearest valid srcs for every dst.

    Matches torch_cluster `knn`: if fewer than k valid sources exist, only
    the valid ones are selected. `k` must be a static Python int.
    """
    d2 = pairwise_sqdist(dst_x, src_x)
    valid = dst_mask[..., :, None] & src_mask[..., None, :]
    if exclude_self:
        n = d2.shape[-1]
        valid = valid & ~jnp.eye(n, dtype=bool)
    d2 = jnp.where(valid, d2, _BIG)
    k = min(k, d2.shape[-1])
    topk, idx = smallest_k(d2, k)      # [..., Nd, k], sorted by distance
    hit = topk < _BIG                  # selected slot holds a real neighbor
    sel = jnp.zeros(d2.shape, dtype=bool)
    sel = jnp.put_along_axis(sel, idx, hit, axis=-1, inplace=False)
    return sel & valid


class EdgeMasks(NamedTuple):
    """Dynamic edge adjacency for one denoiser call.

    ff: [B, F, F] (dst pharm i <- src pharm j)
    pf: [B, F, P] (dst pharm   <- src prot)
    fp: [B, P, F] (dst prot    <- src pharm)   — always pf transposed
    """

    ff: jnp.ndarray
    pf: jnp.ndarray
    fp: jnp.ndarray


def build_dynamic_edges(pharm_x, pharm_mask, prot_x, prot_mask, cutoffs,
                        ff_k=0, pf_k=0):
    """Rebuild the noisy-coordinate-dependent edges (reference
    dynamics_gvp.py:187-227). Called once per denoiser forward."""
    if ff_k and ff_k > 0:
        ff = knn_mask(pharm_x, pharm_mask, pharm_x, pharm_mask, ff_k,
                      exclude_self=True)
    else:
        ff = radius_mask(pharm_x, pharm_mask, pharm_x, pharm_mask,
                         cutoffs["ff"], exclude_self=True)

    if pf_k and pf_k > 0:
        # each pharm center connects to its pf_k nearest prot atoms; fp edges
        # are the reversed pairs (dynamics_gvp.py:202-209)
        pf = knn_mask(pharm_x, pharm_mask, prot_x, prot_mask, pf_k)
    else:
        pf = radius_mask(pharm_x, pharm_mask, prot_x, prot_mask, cutoffs["pf"])

    fp = jnp.swapaxes(pf, -1, -2)
    return EdgeMasks(ff=ff, pf=pf, fp=fp)


class NeighborList(NamedTuple):
    """Fixed-width nearest-neighbor list: for each dst node, up to K srcs."""

    idx: jnp.ndarray   # [B, N, K] int32 indices into the src axis
    mask: jnp.ndarray  # [B, N, K] bool validity


def radius_neighbor_list(x, mask, r, k_max, exclude_self=True):
    """Top-`k_max` nearest neighbors within radius r, as a static-width list.

    Replaces `radius_graph(prot_x, r=cutoff_pp, max_num_neighbors=100)`
    (protein_pharm_dataset.py:235). Returns indices sorted by increasing
    distance with a validity mask (invalid where distance >= r, slot beyond
    the true degree, or either endpoint padded).
    """
    d2 = pairwise_sqdist(x, x)
    valid = mask[..., :, None] & mask[..., None, :]
    if exclude_self:
        n = d2.shape[-1]
        valid = valid & ~jnp.eye(n, dtype=bool)
    valid = valid & (d2 < r * r)
    d2 = jnp.where(valid, d2, _BIG)
    k_max = min(k_max, d2.shape[-1])
    neg_d, idx = lax.top_k(-d2, k_max)
    nbr_mask = (-neg_d) < _BIG
    return NeighborList(idx=idx.astype(jnp.int32), mask=nbr_mask)


def gather_neighbor_coords(x, idx):
    """x: [B, N, 3], idx: [B, Nd, K] -> gathered coords [B, Nd, K, 3].

    Runs as a one-hot matmul: the equivalent `take_along_axis` lowers to an
    HLO row gather whose 3-wide rows run ~30x below HBM bandwidth on TPU
    (549 us/step for the [32,256,16] pp gather in the train-step profile vs
    microseconds as a matmul). Precision.HIGHEST keeps the selection
    bit-exact (1.0 * value reconstructs exactly in the bf16-pass f32
    decomposition); same approach as models/conv._gather_rows.
    """
    n = x.shape[1]
    onehot = jax.nn.one_hot(idx, n, dtype=x.dtype)          # [B,Nd,K,N]
    return jnp.einsum("bnkp,bpd->bnkd", onehot, x,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=x.dtype)


def build_pp_neighbors(prot_x, prot_mask, cutoff_pp, k_max):
    """Static prot-prot neighbor list (translation invariant; compute once)."""
    if cutoff_pp <= 0:
        b, p = prot_mask.shape
        k = min(k_max, p)
        idx = jnp.zeros((b, p, k), dtype=jnp.int32)
        return NeighborList(idx=idx, mask=jnp.zeros((b, p, k), dtype=bool))
    return radius_neighbor_list(prot_x, prot_mask, cutoff_pp, k_max)
