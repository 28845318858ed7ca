"""Dense mask-batched heterogeneous GVP graph convolution.

TPU-native replacement for the reference `GVPMultiEdgeConv`
(models/gvp.py:343-550) and `GVPEdgeConv` (models/gvp.py:170-341). Instead of
DGL's ragged CSR message passing (`apply_edges` + `multi_update_all`), every
edge type is computed over a static-shape pair tensor:

* `ff` (pharm->pharm) and `fp` (pharm->prot) use *full* adjacency masks —
  the pharmacophore source/destination axis is tiny (<= ~8 centers), so
  all-pairs materialization is far cheaper than gather/scatter;
* `pp` (prot->prot) and knn-mode `pf` (prot->pharm) use fixed-width
  nearest-neighbor lists gathered with `take_along_axis`, since the pocket
  can hold hundreds of atoms (radius-mode pf keeps the exact full mask).
  The adjacency + geometry descriptors are built once per denoiser forward
  in `models/edges.py`.

Both paths run the same message GVP chain on `[..., M, ...]`-shaped edge
tensors and reduce over the M axis under the edge validity mask. The message
semantics (src scalars ∥ RBF(d) scalars, normalized displacement ∥ src
vectors) are exactly the reference's (gvp.py:472-480, 540-550), as are the
aggregation variants: per-edge-type mean or sum with cross-type sum
(gvp.py:484-497), constant / per-ntype / dynamic average-degree message
normalization (gvp.py:499-517), and the residual + double-layernorm update
(gvp.py:518-532).
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from pharmaforge_tpu.models.gvp import GVP, GVPChain, GVPDropout, GVPLayerNorm

Array = jnp.ndarray
NodeData = Tuple[Array, Array, Array]  # (scalars [B,N,S], coords [B,N,3], vectors [B,N,V,3])

# canonical edge types, (src_ntype, name, dst_ntype) — reference
# dynamics_gvp.py:46-54
ETYPES = (
    ("pharm", "ff", "pharm"),
    ("prot", "pf", "pharm"),
    ("pharm", "fp", "prot"),
    ("prot", "pp", "prot"),
)


def _gather_neighbors(h_src: Array, v_src: Array, idx: Array,
                      compute_dtype: str = "float32") -> Tuple[Array, Array]:
    """Gather per-dst neighbor features. idx: [B, Nd, K] into the src axis.

    The gather runs as a one-hot MATMUL on the MXU: profiling shows TPU
    row-gathers (`take_along_axis` -> HLO gather) run ~30x below HBM
    bandwidth and dominated the sampling step, while onehot(idx) @ table is
    exact selection (a single nonzero per output row) at matmul speed. In
    fp32 mode the einsum forces Precision.HIGHEST: the bf16x-pass f32
    decomposition reconstructs 1.0 * value exactly, so selection stays
    bit-exact (covered by a test against take_along_axis).
    """
    b, p, s_dim = h_src.shape
    nd, k = idx.shape[1], idx.shape[2]
    v_dim = v_src.shape[-2]
    table = jnp.concatenate(
        [h_src, v_src.reshape(b, p, v_dim * 3)], axis=-1)
    if compute_dtype == "bfloat16":
        onehot = jax.nn.one_hot(idx, p, dtype=jnp.bfloat16)   # [B,Nd,K,P]
        g = jnp.einsum("bnkp,bpd->bnkd", onehot,
                       table.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    else:
        onehot = jax.nn.one_hot(idx, p, dtype=table.dtype)
        g = jnp.einsum("bnkp,bpd->bnkd", onehot, table,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    h_g = g[..., :s_dim]
    v_g = g[..., s_dim:].reshape(b, nd, k, v_dim, 3)
    return h_g, v_g


def _aggregate(s_msg: Array, v_msg: Array, mask: Array,
               mean: bool) -> Tuple[Array, Array, Array]:
    """Reduce messages over the neighbor axis under the edge mask.

    Returns (scalar_agg [B,Nd,S], vector_agg [B,Nd,V,3], count [B,Nd]).
    Mean over an empty edge set yields 0 (DGL convention).
    """
    m = mask.astype(s_msg.dtype)
    s_sum = jnp.sum(s_msg * m[..., None], axis=2)
    v_sum = jnp.sum(v_msg * m[..., None, None], axis=2)
    count = jnp.sum(m, axis=2)
    if mean:
        denom = jnp.maximum(count, 1.0)
        s_sum = s_sum / denom[..., None]
        v_sum = v_sum / denom[..., None, None]
    return s_sum, v_sum, count


class GVPEdgeConv(nn.Module):
    """GVP graph convolution on a single edge type.

    Dense counterpart of the reference's `GVPEdgeConv` (gvp.py:170-341,
    defined there but never instantiated): message GVP chain over one edge
    type + aggregation + residual update on the destination nodes, with the
    optional `use_dst_feats` variant that concatenates destination features
    into the messages (gvp.py:211-213, 323-335).
    """

    scalar_size: int = 128
    vector_size: int = 16
    n_message_gvps: int = 1
    n_update_gvps: int = 1
    use_dst_feats: bool = False
    rbf_dim: int = 16
    message_norm: Union[float, int, str] = 10
    dropout: float = 0.0
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self,
                 src: NodeData, dst: NodeData, dst_mask: Array,
                 edge: "EdgeData",
                 deterministic: bool = True) -> Tuple[Array, Array]:
        """Returns the updated destination (scalars, vectors)."""
        dtype = None if self.compute_dtype == "float32" else self.compute_dtype
        h_src, _, v_src = src
        h_dst, _, v_dst = dst

        specs = []
        for i in range(self.n_message_gvps):
            c_in = self.vector_size + 1 if i == 0 else self.vector_size
            s_in = self.scalar_size + self.rbf_dim if i == 0 \
                else self.scalar_size
            if i == 0 and self.use_dst_feats:
                c_in += self.vector_size
                s_in += self.scalar_size
            specs.append(dict(
                dim_vectors_in=c_in, dim_vectors_out=self.vector_size,
                dim_feats_in=s_in, dim_feats_out=self.scalar_size,
                feats_activation="silu", vectors_activation="sigmoid"))
        chain = GVPChain(tuple(specs), dtype=dtype, name="edge_message")

        if edge.idx is not None:
            h_g, v_g = _gather_neighbors(h_src, v_src, edge.idx,
                                         self.compute_dtype)
        else:
            nd, ns = edge.mask.shape[1], edge.mask.shape[2]
            h_g = jnp.broadcast_to(h_src[:, None],
                                   (h_src.shape[0], nd, ns, h_src.shape[-1]))
            v_g = jnp.broadcast_to(
                v_src[:, None], (v_src.shape[0], nd, ns,
                                 v_src.shape[-2], 3))

        vec_in = jnp.concatenate([edge.x_dir[..., None, :], v_g], axis=-2)
        sca_in = jnp.concatenate([h_g, edge.d_rbf], axis=-1)
        if self.use_dst_feats:
            m = edge.mask.shape[-1]
            vec_in = jnp.concatenate(
                [vec_in, jnp.broadcast_to(v_dst[:, :, None],
                                          v_g.shape)], axis=-2)
            sca_in = jnp.concatenate(
                [sca_in, jnp.broadcast_to(h_dst[:, :, None], h_g.shape)],
                axis=-1)

        s_msg, v_msg = chain((sca_in, vec_in))
        use_mean = self.message_norm == "mean"
        nv = 1.0 if use_mean else float(self.message_norm)
        s_agg, v_agg, _ = _aggregate(s_msg.astype(jnp.float32),
                                     v_msg.astype(jnp.float32),
                                     edge.mask, mean=use_mean)
        s_agg = s_agg / nv
        v_agg = v_agg / nv

        dropout = GVPDropout(self.dropout, name="dropout")
        s_agg, v_agg = dropout(s_agg, v_agg, deterministic)
        h = h_dst + s_agg
        v = v_dst + v_agg
        h, v = GVPLayerNorm(self.scalar_size, name="message_layer_norm")(h, v)

        upd_specs = tuple(dict(
            dim_vectors_in=self.vector_size, dim_vectors_out=self.vector_size,
            dim_feats_in=self.scalar_size, dim_feats_out=self.scalar_size,
            feats_activation="silu", vectors_activation="sigmoid")
            for _ in range(self.n_update_gvps))
        s_res, v_res = GVPChain(upd_specs, name="node_update")((h, v))
        s_res, v_res = dropout(s_res, v_res, deterministic)
        h = h + s_res
        v = v + v_res
        h, v = GVPLayerNorm(self.scalar_size, name="update_layer_norm")(h, v)
        mask = dst_mask.astype(h.dtype)
        return h * mask[..., None], v * mask[..., None, None]


class GVPMultiEdgeConv(nn.Module):
    """One hetero GVP convolution over the 4 canonical edge types."""

    scalar_size: int = 128
    vector_size: int = 16
    n_message_gvps: int = 1
    n_update_gvps: int = 1
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    message_norm: Union[float, int, str, tuple] = 10
    dropout: float = 0.0
    # activation dtype of the edge-message chains ('bfloat16' halves HBM
    # traffic on the dominant [B, Nd, M, ...] edge tensors; the aggregation,
    # residual stream and node updates stay fp32)
    compute_dtype: str = "float32"

    def _message_chain(self, name: str) -> GVPChain:
        dtype = None if self.compute_dtype == "float32" else self.compute_dtype
        specs = []
        for i in range(self.n_message_gvps):
            if i == 0:
                dim_vectors_in = self.vector_size + 1
                dim_feats_in = self.scalar_size + self.rbf_dim
            else:
                dim_vectors_in = self.vector_size
                dim_feats_in = self.scalar_size
            specs.append(dict(
                dim_vectors_in=dim_vectors_in,
                dim_vectors_out=self.vector_size,
                dim_feats_in=dim_feats_in,
                dim_feats_out=self.scalar_size,
                feats_activation="silu",
                vectors_activation="sigmoid",
            ))
        return GVPChain(tuple(specs), dtype=dtype, name=name)

    def _update_chain(self, name: str) -> GVPChain:
        specs = tuple(dict(
            dim_vectors_in=self.vector_size,
            dim_vectors_out=self.vector_size,
            dim_feats_in=self.scalar_size,
            dim_feats_out=self.scalar_size,
            feats_activation="silu",
            vectors_activation="sigmoid",
        ) for _ in range(self.n_update_gvps))
        return GVPChain(specs, name=name)

    def _norm_mode(self):
        """Resolve the message_norm config (reference gvp.py:369-389).

        Returns (use_mean_agg, norm_values: {ntype: float}) where a norm value
        of 0.0 requests dynamic average-degree normalization.
        """
        mn = self.message_norm
        if isinstance(mn, tuple):  # hashable stand-in for a per-ntype dict
            mn = dict(mn)
        dst_ntypes = ("pharm", "prot")
        if isinstance(mn, str):
            if mn != "mean":
                raise ValueError(f"message_norm must be 'mean' or a number, got {mn!r}")
            return True, {nt: 1.0 for nt in dst_ntypes}
        if isinstance(mn, dict):
            vals = {nt: float(mn[nt]) for nt in dst_ntypes}
            if any(v < 0 for v in vals.values()):
                raise ValueError(f"message_norm values must be >= 0, got {mn}")
            return False, vals
        if isinstance(mn, (int, float)):
            if mn < 0:
                raise ValueError(f"message_norm values must be >= 0, got {mn}")
            return False, {nt: float(mn) for nt in dst_ntypes}
        raise ValueError(f"invalid message_norm: {mn!r}")

    @nn.compact
    def __call__(self,
                 node_feats: Dict[str, NodeData],
                 node_masks: Dict[str, Array],
                 bundle: Dict[str, "EdgeData"],
                 deterministic: bool = True,
                 update_ntypes: tuple = ("pharm", "prot")) -> Dict[str, NodeData]:
        """`bundle` carries per-edge-type adjacency + geometry precomputed
        once per denoiser forward (models/edges.py) — gathered neighbor
        lists where the source fan-in is narrow (pp, knn-mode pf), full
        masks where the source set is tiny.

        `update_ntypes` prunes destination node types whose updated state
        is never consumed downstream (the final conv only feeds the pharm
        noise head, so its prot-side messages + update are dead compute —
        skipping them changes nothing numerically and removes the most
        expensive edge type, pp, from the last layer)."""
        use_mean, norm_values = self._norm_mode()
        dropout = GVPDropout(self.dropout, name="dropout")

        agg = {"pharm": None, "prot": None}
        counts = {"pharm": 0.0, "prot": 0.0}

        for etype in ETYPES:
            src_nt, ename, dst_nt = etype
            if dst_nt not in update_ntypes:
                continue
            key = "_".join(etype)
            chain = self._message_chain(f"edge_message_fns_{key}")

            h_src, _, v_src = node_feats[src_nt]
            ed = bundle[ename]
            emask = ed.mask

            if ed.idx is not None:
                h_g, v_g = _gather_neighbors(h_src, v_src, ed.idx,
                                             self.compute_dtype)
            else:
                nd, ns = emask.shape[1], emask.shape[2]
                h_g = jnp.broadcast_to(h_src[:, None], (h_src.shape[0], nd, ns, h_src.shape[-1]))
                v_g = jnp.broadcast_to(
                    v_src[:, None],
                    (v_src.shape[0], nd, ns, v_src.shape[-2], 3))

            vec_in = jnp.concatenate([ed.x_dir[..., None, :], v_g], axis=-2)
            sca_in = jnp.concatenate([h_g, ed.d_rbf], axis=-1)

            s_msg, v_msg = chain((sca_in, vec_in))
            # aggregate in fp32 regardless of the chain's compute dtype
            s_agg, v_agg, cnt = _aggregate(
                s_msg.astype(jnp.float32), v_msg.astype(jnp.float32),
                emask, mean=use_mean)

            if agg[dst_nt] is None:
                agg[dst_nt] = (s_agg, v_agg)
            else:
                agg[dst_nt] = (agg[dst_nt][0] + s_agg, agg[dst_nt][1] + v_agg)
            counts[dst_nt] = counts[dst_nt] + cnt

        out: Dict[str, NodeData] = {}
        for ntype in ("pharm", "prot"):
            if ntype not in update_ntypes:
                out[ntype] = node_feats[ntype]
                continue
            h, x, v = node_feats[ntype]
            mask = node_masks[ntype].astype(h.dtype)
            s_msg, v_msg = agg[ntype]

            nv = norm_values[ntype]
            if nv == 0.0:
                # dynamic per-graph normalization: average incoming degree + 1
                # (reference gvp.py:504-507)
                n_edges = jnp.sum(counts[ntype] * mask, axis=1)          # [B]
                n_nodes = jnp.maximum(jnp.sum(mask, axis=1), 1.0)        # [B]
                norm = (n_edges / n_nodes + 1.0)[:, None, None]          # [B,1,1]
                s_msg = s_msg / norm
                v_msg = v_msg / norm[..., None]
            else:
                s_msg = s_msg / nv
                v_msg = v_msg / nv

            s_msg, v_msg = dropout(s_msg, v_msg, deterministic)
            h = h + s_msg
            v = v + v_msg
            h, v = GVPLayerNorm(self.scalar_size,
                                name=f"message_layer_norms_{ntype}")(h, v)

            s_res, v_res = self._update_chain(f"node_update_fns_{ntype}")((h, v))
            s_res, v_res = dropout(s_res, v_res, deterministic)
            h = h + s_res
            v = v + v_res
            h, v = GVPLayerNorm(self.scalar_size,
                                name=f"update_layer_norms_{ntype}")(h, v)

            # keep padded slots exactly zero so they can never leak into
            # downstream reductions
            h = h * mask[..., None]
            v = v * mask[..., None, None]
            out[ntype] = (h, x, v)

        return out
