"""The noise-prediction network (denoiser) over dense masked point clouds.

TPU-native re-design of the reference `PharmRecDynamicsGVP` +
`PharmRecGVP` + `NoisePredictionBlock` (models/dynamics_gvp.py:10-245):

* pharm/prot scalar features get the per-graph timestep concatenated and are
  encoded to a shared `n_hidden_scalars` space via Linear + SiLU + LayerNorm
  (dynamics_gvp.py:107-117,143-151);
* vector channels start at zero (dynamics_gvp.py:156-173);
* the dynamic `ff`/`pf`/`fp` adjacency is rebuilt from the *current noisy*
  pharm coordinates on every forward (dynamics_gvp.py:176-177) — here as
  dense descriptors inside jit (`models.edges.build_edge_bundle`) instead of
  torch_cluster kernels;
* `n_convs` hetero GVP convolutions over all 4 edge types
  (dynamics_gvp.py:62-75);
* a final GVP chain collapses the pharm node state to 6 scalar outputs and
  one 3-vector (dynamics_gvp.py:10-42). Note the reference re-creates the
  noise head inside its conv loop so only the last instance survives
  (dynamics_gvp.py:77-82) — net effect is a single head, which is what we
  build.

The static `pp` neighbor list is an input (translation-invariant, so it is
computed once per batch and reused across all diffusion steps).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pharmaforge_tpu.models.conv import GVPMultiEdgeConv
from pharmaforge_tpu.models.edges import EdgeData, build_edge_bundle
from pharmaforge_tpu.models.gvp import GVP, GVPChain, TorchLinear
from pharmaforge_tpu.ops.neighbors import NeighborList

Array = jnp.ndarray


class NoisePredictionBlock(nn.Module):
    """GVP chain -> (out_scalar_dim scalars, one 3-vector) per pharm node.

    Mirrors reference dynamics_gvp.py:10-42: all GVPs but the last keep the
    (in_scalar_dim, vector_size) shape with sigmoid vector gating; the last
    maps to (intermediate_scalar_dim, 1 vector) with identity vector
    activation, followed by a Linear to the scalar output dim.
    """

    in_scalar_dim: int
    out_scalar_dim: int
    vector_size: int
    n_gvps: int = 3
    intermediate_scalar_dim: int = 64

    @nn.compact
    def __call__(self, scalars: Array, vectors: Array) -> Tuple[Array, Array]:
        specs = []
        for i in range(self.n_gvps):
            last = i == self.n_gvps - 1
            specs.append(dict(
                dim_vectors_in=self.vector_size,
                dim_vectors_out=1 if last else self.vector_size,
                dim_feats_in=self.in_scalar_dim,
                dim_feats_out=(self.intermediate_scalar_dim if last
                               else self.in_scalar_dim),
                feats_activation="silu",
                vectors_activation="identity" if last else "sigmoid",
            ))
        scalars, vectors = GVPChain(tuple(specs),
                                    name="gvps")((scalars, vectors))
        scalars = TorchLinear(self.out_scalar_dim,
                              name="to_scalar_output")(scalars)
        vectors = jnp.squeeze(vectors, axis=-2)  # [..., 1, 3] -> [..., 3]
        return scalars, vectors


class ScalarEncoder(nn.Module):
    """Linear + SiLU + LayerNorm node-feature encoder
    (reference dynamics_gvp.py:107-117)."""

    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = TorchLinear(self.hidden, name="linear")(x)
        x = nn.silu(x)
        # torch LayerNorm default eps
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class PharmRecDynamics(nn.Module):
    """eps_theta(z_t, t | pocket): predicts (feature noise, coordinate noise).

    Inputs are dense masked arrays; outputs are masked to valid pharm slots.
    """

    n_pharm_scalars: int = 6
    n_prot_scalars: int = 11
    vector_size: int = 16
    n_convs: int = 4
    n_hidden_scalars: int = 128
    message_norm: object = 1
    graph_cutoffs: tuple = (("pp", 3.5), ("pf", 8.0), ("fp", 8.0), ("ff", 9.0))
    n_message_gvps: int = 3
    n_update_gvps: int = 2
    n_noise_gvps: int = 3
    dropout: float = 0.0
    ff_k: int = 0
    pf_k: int = 0
    # skip the dead prot-side message/update work in the final conv (the
    # noise head only reads pharm state); numerically identical, removes the
    # expensive pp edge type from the last layer
    prune_dead_prot_tail: bool = True
    # run the final prot update only on the F*K pf-gathered atoms (exact;
    # see the compact-tail note in __call__); off switch for A/B testing
    compact_prot_tail: bool = True
    # activation dtype for the conv message/update chains
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self,
                 pharm_h_t: Array,   # [B, F, n_pharm_scalars]
                 pharm_x_t: Array,   # [B, F, 3]
                 pharm_mask: Array,  # [B, F] bool
                 prot_h: Array,      # [B, P, n_prot_scalars]
                 prot_x: Array,      # [B, P, 3]
                 prot_mask: Array,   # [B, P] bool
                 t: Array,           # [B] float in [0, 1]
                 pp_nbrs: NeighborList,
                 deterministic: bool = True,
                 pp_edge: EdgeData = None,
                 pocket_group_size: int = 1) -> Tuple[Array, Array]:
        """`pp_edge` optionally injects the precomputed prot-prot EdgeData
        (translation invariant, so the sampling chain computes it once for
        all T steps instead of once per step).

        `pocket_group_size` = C > 1 declares every C consecutive batch rows
        share an identical pocket AND an identical timestep t (the pocket-
        tiling layout of batched sampling, reference copy_graph +
        pharmacodiff.py:540-556). The first conv's prot-prot messages —
        which depend only on (prot_h, t, pp geometry) because the vector
        channels start at zero — are then computed once per group instead
        of once per copy. Numerically identical to the ungrouped path."""
        cutoffs = dict(self.graph_cutoffs)

        # timestep concat + scalar encoding
        b, f = pharm_mask.shape
        p = prot_mask.shape[1]
        t_pharm = jnp.broadcast_to(t[:, None, None], (b, f, 1))
        t_prot = jnp.broadcast_to(t[:, None, None], (b, p, 1))
        pharm_scalars = ScalarEncoder(self.n_hidden_scalars, name="pharm_encoder")(
            jnp.concatenate([pharm_h_t, t_pharm], axis=-1))
        prot_scalars = ScalarEncoder(self.n_hidden_scalars, name="prot_encoder")(
            jnp.concatenate([prot_h, t_prot], axis=-1))

        # zero-init vector channels (dynamics_gvp.py:156-173)
        v_pharm = jnp.zeros((b, f, self.vector_size, 3), pharm_scalars.dtype)
        v_prot = jnp.zeros((b, p, self.vector_size, 3), prot_scalars.dtype)

        # mask padded slots so they contribute exact zeros everywhere
        pharm_scalars = pharm_scalars * pharm_mask[..., None]
        prot_scalars = prot_scalars * prot_mask[..., None]

        node_feats: Dict[str, Tuple[Array, Array, Array]] = {
            "pharm": (pharm_scalars, pharm_x_t, v_pharm),
            "prot": (prot_scalars, prot_x, v_prot),
        }
        node_masks = {"pharm": pharm_mask, "prot": prot_mask}

        # dynamic edges (adjacency + geometry) from the current noisy
        # coordinates, computed once per forward (x is constant across the
        # conv stack)
        bundle = build_edge_bundle(pharm_x_t, pharm_mask, prot_x, prot_mask,
                                   cutoffs, ff_k=self.ff_k, pf_k=self.pf_k,
                                   pp_nbrs=pp_nbrs, pp_edge=pp_edge)

        # compact prot tail: when the LAST conv only updates pharm (its
        # prot-side work is pruned as dead), the conv before it is the final
        # writer of prot state, and that state is only ever read back through
        # the next conv's pf gathers at bundle['pf'].idx. Its prot update can
        # therefore run on just those F*K rows, and the subsequent pf
        # "gather" becomes a reshape. Exact per-atom numerics; knn-mode pf
        # only (radius mode has no narrow index list). Deterministic mode
        # only: with dropout active the draws would fall per compact slot
        # instead of per atom, so training keeps the full-width path.
        compact_at = self.n_convs - 2 if (
            self.compact_prot_tail and self.prune_dead_prot_tail
            and self.n_convs >= 2 and self.pf_k and self.pf_k > 0
            and deterministic) else None

        from pharmaforge_tpu.models.edges import PreGatheredEdgeData
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            update_ntypes = ("pharm",) if (last and self.prune_dead_prot_tail) \
                else ("pharm", "prot")
            pf = bundle["pf"]
            prot_dst_idx = None
            if compact_at is not None and i == compact_at:
                prot_dst_idx = pf.idx.reshape(pf.idx.shape[0], -1)
            node_feats = GVPMultiEdgeConv(
                scalar_size=self.n_hidden_scalars,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                n_update_gvps=self.n_update_gvps,
                message_norm=self.message_norm,
                dropout=self.dropout,
                compute_dtype=self.compute_dtype,
                name=f"conv_layers_{i}",
            )(node_feats, node_masks, bundle,
              deterministic=deterministic, update_ntypes=update_ntypes,
              # conv 0's source vectors are the zero-init channels: the
              # message chains skip their vector gathers/einsums entirely
              src_vectors_zero=(i == 0),
              # pocket-copy dedup is only valid while the prot state is
              # copy-independent, i.e. before the first fp update lands
              pp_src_group_size=pocket_group_size if i == 0 else 1,
              prot_dst_idx=prot_dst_idx)
            if prot_dst_idx is not None:
                # prot state is now compact: the remaining conv reads it only
                # through pf, which becomes a pre-gathered reshape
                bundle = dict(bundle)
                bundle["pf"] = PreGatheredEdgeData(
                    mask=pf.mask, x_dir=pf.x_dir, d_rbf=pf.d_rbf)

        eps_h, eps_x = NoisePredictionBlock(
            in_scalar_dim=self.n_hidden_scalars,
            out_scalar_dim=self.n_pharm_scalars,
            vector_size=self.vector_size,
            n_gvps=self.n_noise_gvps,
            name="noise_predictor",
        )(node_feats["pharm"][0], node_feats["pharm"][2])

        eps_h = eps_h * pharm_mask[..., None]
        eps_x = eps_x * pharm_mask[..., None]
        return eps_h, eps_x
