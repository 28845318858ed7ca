"""Per-edge-type data bundles for the dense hetero convolution.

Unifies the two message-computation layouts behind one descriptor:

* gathered form (`idx` set): each destination node sees M gathered source
  rows — used for prot-prot (top-K radius list) and, in knn mode, for
  prot->pharm (each pharm center attends to its pf_k nearest prot atoms,
  reference dynamics_gvp.py:202-206). M is small and static.
* full form (`idx` None): all-pairs mask over the source axis — used when
  the source set is tiny (ff, fp) or when radius semantics genuinely
  connect most pairs (pf in radius mode).

The bundle also carries the edge geometry (unit direction, RBF), computed
ONCE per denoiser forward — coordinates don't change across the conv stack —
and, for prot-prot, once per *sampling chain* (translation invariant).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pharmaforge_tpu.ops.geometry import norm_no_nan, rbf
from pharmaforge_tpu.ops.neighbors import (
    NeighborList,
    gather_neighbor_coords,
    knn_mask,
    radius_mask,
)

Array = jnp.ndarray

RBF_DMAX = 15.0
RBF_DIM = 16
_BIG = 1e30


class EdgeData(NamedTuple):
    """One edge type's adjacency + geometry.

    mask:  [B, Nd, M] validity
    idx:   [B, Nd, M] int32 gather indices into the src axis, or None when
           M spans the full source set
    x_dir: [B, Nd, M, 3] unit displacement src - dst
    d_rbf: [B, Nd, M, RBF_DIM]
    """

    mask: Array
    idx: Optional[Array]
    x_dir: Array
    d_rbf: Array


class GroupedEdgeData:
    """pp edges at pocket-GROUP level for batched sampling.

    During sampling every group of `copies` consecutive batch rows is one
    pocket tiled `copies` times (reference copy_graph replication,
    unorganized_utils.py:28-81); the prot coords are static across the
    chain, so the pp adjacency AND geometry are identical within a group.
    Carrying them at group level ([G, Nd, K, ...] with B = G * copies)
    instead of broadcasting to per-copy rows feeds the fused Pallas middle-
    conv kernel (ops/pallas/pp_message.py) 30x less descriptor traffic and
    lets it build its gather matrix once per group tile. Consumers that
    need per-copy rows call `expand()` (exactly the old broadcast).

    `copies` is static (hashable) — this class is registered as a pytree
    with copies as aux data.
    """

    def __init__(self, mask, idx, x_dir, d_rbf, copies: int):
        self.mask = mask
        self.idx = idx
        self.x_dir = x_dir
        self.d_rbf = d_rbf
        self.copies = copies

    def as_edge_data(self) -> EdgeData:
        """The group-level arrays as a plain EdgeData."""
        return EdgeData(mask=self.mask, idx=self.idx, x_dir=self.x_dir,
                        d_rbf=self.d_rbf)

    def expand(self) -> EdgeData:
        """Broadcast to per-copy rows ([B, Nd, K, ...], B = G * copies)."""
        rep = lambda a: jnp.repeat(a, self.copies, axis=0)
        return EdgeData(mask=rep(self.mask), idx=rep(self.idx),
                        x_dir=rep(self.x_dir), d_rbf=rep(self.d_rbf))


def _grouped_flatten(g: GroupedEdgeData):
    return (g.mask, g.idx, g.x_dir, g.d_rbf), g.copies


def _grouped_unflatten(copies, leaves):
    return GroupedEdgeData(*leaves, copies=copies)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(GroupedEdgeData, _grouped_flatten,
                          _grouped_unflatten)


class PreGatheredEdgeData(NamedTuple):
    """pf edges whose source prot table is ALREADY in pf-slot order.

    Produced by the compact prot-tail path: the previous conv updated only
    the F*K prot atoms the pf lists reference, stored as a [B, F*K, ...]
    table where slot (f, k) IS pharm f's k-th neighbor. The message chain's
    "gather" is then a reshape. mask/x_dir/d_rbf are the ordinary pf edge
    descriptors ([B, F, K, ...]).
    """

    mask: Array
    x_dir: Array
    d_rbf: Array


class ReverseEdgeData(NamedTuple):
    """Edges laid out along their REVERSE pairs' destination axis.

    fp edges are exactly the pf pairs reversed (dynamics_gvp.py:209,215).
    In knn mode pf is a narrow gathered list (each pharm center picks its
    pf_k nearest prots), so the fp messages are computed on the same tiny
    [B, F, K] layout — the source pharm IS the layout row, the destination
    prot is `idx` — and scattered into the prot axis with a one-hot matmul.
    This avoids materializing the full [B, P, F] pair grid whose slots are
    ~98% masked. Geometry is shared with pf: x_dir negated, RBF identical.

    mask/idx: [B, F, K]    (idx = destination prot index per slot)
    x_dir:    [B, F, K, 3] unit displacement src(pharm) - dst(prot)
    d_rbf:    [B, F, K, RBF_DIM]
    n_dst:    static size of the prot axis to scatter into
    """

    mask: Array
    idx: Array
    x_dir: Array
    d_rbf: Array
    n_dst: int


def _pair_geometry(x_dst, x_src_pairs):
    """x_dst [B,Nd,3] against per-dst src coords [B,Nd,M,3]."""
    x_diff = x_src_pairs - x_dst[:, :, None, :]
    dij = norm_no_nan(x_diff, keepdims=True) + 1e-8
    return x_diff / dij, rbf(jnp.squeeze(dij, -1), d_max=RBF_DMAX,
                             d_count=RBF_DIM)


def full_edge_data(x_dst, x_src, mask) -> EdgeData:
    x_dir, d_rbf = _pair_geometry(
        x_dst, jnp.broadcast_to(x_src[:, None],
                                (x_src.shape[0], x_dst.shape[1])
                                + x_src.shape[1:]))
    return EdgeData(mask=mask, idx=None, x_dir=x_dir, d_rbf=d_rbf)


def gathered_edge_data(x_dst, x_src, nbrs: NeighborList) -> EdgeData:
    x_g = gather_neighbor_coords(x_src, nbrs.idx)
    x_dir, d_rbf = _pair_geometry(x_dst, x_g)
    return EdgeData(mask=nbrs.mask, idx=nbrs.idx, x_dir=x_dir, d_rbf=d_rbf)


def build_pp_edge(prot_x, prot_mask, cutoff: float, k_max: int
                  ) -> "tuple[NeighborList, EdgeData]":
    """Prot-prot neighbor list + edge geometry in one place.

    Selection runs as the plain XLA path (one 256-wide top_k sort) and the
    coordinate gather as a one-hot matmul. The Pallas `knn_select` kernel
    also supports this edge type (exclude_self + cutoff, tested in
    tests/test_knn_select.py) but MEASURED SLOWER here: at dst width 256
    the k=16 VMEM selection passes cost more than the single sort (269.6
    vs 295.1 train steps/sec on v5e), the opposite of the pf regime
    (dst width 8) where the kernel wins. Keep the sort for pp unless the
    dst axis shrinks."""
    from pharmaforge_tpu.ops.neighbors import (
        build_pp_neighbors,
        gather_neighbor_coords,
    )
    nbrs = build_pp_neighbors(prot_x, prot_mask, cutoff, k_max)
    x_g = gather_neighbor_coords(prot_x, nbrs.idx)
    x_dir, d_rbf = _pair_geometry(prot_x, x_g)
    return nbrs, EdgeData(mask=nbrs.mask, idx=nbrs.idx, x_dir=x_dir,
                          d_rbf=d_rbf)


def max_pp_out_degree(ed: EdgeData) -> Array:
    """Maximum out-degree of a gathered pp edge: the largest number of
    (dst, slot) positions referencing any single source atom. [G] -> scalar
    int32. Host-syncs cheaply in PocketSampler to pick a static `k_out`
    for `build_pp_out_edges` (the pp graph is static across a sampling
    chain, so one probe per pocket batch suffices)."""
    g, p, k = ed.idx.shape
    flat_idx = ed.idx.reshape(g, p * k)
    flat_valid = ed.mask.reshape(g, p * k)
    oh = jax.nn.one_hot(flat_idx, p, dtype=jnp.int32) \
        * flat_valid[..., None].astype(jnp.int32)
    return jnp.max(jnp.sum(oh, axis=1))


def build_pp_out_edges(ed: EdgeData, k_out: int
                       ) -> "tuple[Array, Array]":
    """Transpose of a gathered pp edge: for every SOURCE atom, the flat
    edge ids (dst * K + slot) that reference it.

    The per-copy middle-conv correction path (models/conv.py
    `pp_correction`) uses this to enumerate exactly the pp edges whose
    messages change when a source atom's state diverges across pocket
    copies. Exact iff `k_out >= max_pp_out_degree(ed)` — the caller probes
    that (PocketSampler) because shapes must be static under jit.

    ed.idx/mask [G, P, K] -> (out_eid [G, P, k_out] int32,
                              out_mask [G, P, k_out] bool).
    """
    g, p, k = ed.idx.shape
    e = p * k
    flat_idx = ed.idx.reshape(g, e).astype(jnp.int32)
    flat_valid = ed.mask.reshape(g, e)
    # rank of each valid edge within its source's out-list = number of
    # valid edges at the same source up to and including it, minus one
    oh = jax.nn.one_hot(flat_idx, p, dtype=jnp.int32) \
        * flat_valid[..., None].astype(jnp.int32)
    cum = jnp.cumsum(oh, axis=1)                              # [G, E, P]
    pos = jnp.take_along_axis(cum, flat_idx[..., None],
                              axis=2)[..., 0] - 1             # [G, E]
    keep = flat_valid & (pos < k_out)
    # overflowed or invalid edges scatter into a dump row p, sliced off
    src_s = jnp.where(keep, flat_idx, p)
    pos_s = jnp.where(keep, pos, 0)
    gi = jnp.arange(g)[:, None]
    e_ids = jnp.broadcast_to(jnp.arange(e, dtype=jnp.int32)[None], (g, e))
    out_eid = jnp.zeros((g, p + 1, k_out), jnp.int32) \
        .at[gi, src_s, pos_s].set(e_ids)
    out_mask = jnp.zeros((g, p + 1, k_out), bool) \
        .at[gi, src_s, pos_s].set(keep)
    return out_eid[:, :p], out_mask[:, :p]


def knn_neighbor_list(dst_x, dst_mask, src_x, src_mask, k: int) -> NeighborList:
    """k-nearest valid srcs per dst as a gathered list (torch_cluster `knn`
    semantics; fewer than k valid srcs -> masked slots). Runs per diffusion
    step, so the selection uses `smallest_k` (k argmin passes) instead of a
    full top_k sort of the source axis."""
    from pharmaforge_tpu.ops.neighbors import pairwise_sqdist, smallest_k
    d2 = pairwise_sqdist(dst_x, src_x)
    valid = dst_mask[..., :, None] & src_mask[..., None, :]
    d2 = jnp.where(valid, d2, _BIG)
    k = min(k, d2.shape[-1])
    d, idx = smallest_k(d2, k)
    return NeighborList(idx=idx.astype(jnp.int32), mask=d < _BIG)


def scatter_transpose_mask(idx, mask, n_src: int) -> Array:
    """[B, Nd, K] gather list -> dense [B, n_src, Nd] reverse-edge mask."""
    onehot = jnp.zeros(idx.shape[:2] + (n_src,), bool)
    onehot = jnp.put_along_axis(onehot, idx, mask, axis=-1, inplace=False)
    return jnp.swapaxes(onehot, 1, 2)


def build_edge_bundle(pharm_x, pharm_mask, prot_x, prot_mask, cutoffs,
                      ff_k: int, pf_k: int, pp_nbrs: NeighborList,
                      pp_edge: Optional[EdgeData] = None
                      ) -> Dict[str, EdgeData]:
    """All four edge types for one denoiser forward
    (reference dynamics_gvp.py:187-227 rebuilt as dense descriptors).

    `pp_edge` optionally injects the precomputed prot-prot EdgeData
    (translation invariant across a sampling chain).
    """
    bundle: Dict[str, EdgeData] = {}

    # ff: pharm->pharm, radius or knn, self excluded
    if ff_k and ff_k > 0:
        m = knn_mask(pharm_x, pharm_mask, pharm_x, pharm_mask, ff_k,
                     exclude_self=True)
    else:
        m = radius_mask(pharm_x, pharm_mask, pharm_x, pharm_mask,
                        cutoffs["ff"], exclude_self=True)
    bundle["ff"] = full_edge_data(pharm_x, pharm_x, m)

    # pf: prot->pharm; fp: exact reverse pairs
    if pf_k and pf_k > 0:
        from pharmaforge_tpu.ops.pallas import edge_kernel_enabled
        if edge_kernel_enabled():
            # fused selection + coordinate gather in one Pallas launch (the
            # k argmin passes + gather are ~100 tiny VPU ops in plain XLA)
            from pharmaforge_tpu.ops.pallas.knn_select import knn_select
            idx, dist, x_g = knn_select(pharm_x, pharm_mask, prot_x,
                                        prot_mask, pf_k)
            nbrs = NeighborList(idx=idx, mask=dist < _BIG)
            x_dir, d_rbf = _pair_geometry(pharm_x, x_g)
            pf = EdgeData(mask=nbrs.mask, idx=nbrs.idx, x_dir=x_dir,
                          d_rbf=d_rbf)
        else:
            nbrs = knn_neighbor_list(pharm_x, pharm_mask, prot_x, prot_mask,
                                     pf_k)
            pf = gathered_edge_data(pharm_x, prot_x, nbrs)
        bundle["pf"] = pf
        # fp reuses the pf pair list and geometry on the narrow [B, F, K]
        # layout (x_dir negated, same RBF) instead of a full [B, P, F] grid
        bundle["fp"] = ReverseEdgeData(
            mask=nbrs.mask, idx=nbrs.idx, x_dir=-pf.x_dir, d_rbf=pf.d_rbf,
            n_dst=prot_x.shape[1])
    else:
        pf_mask = radius_mask(pharm_x, pharm_mask, prot_x, prot_mask,
                              cutoffs["pf"])
        bundle["pf"] = full_edge_data(pharm_x, prot_x, pf_mask)
        fp_mask = jnp.swapaxes(pf_mask, 1, 2)
        bundle["fp"] = full_edge_data(prot_x, pharm_x, fp_mask)

    # pp: gathered top-K radius list
    if pp_edge is None:
        pp_edge = gathered_edge_data(prot_x, prot_x, pp_nbrs)
    bundle["pp"] = pp_edge
    return bundle
