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

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pharmaforge_tpu.models.conv import GVPMultiEdgeConv
from pharmaforge_tpu.models.edges import EdgeData, build_edge_bundle
from pharmaforge_tpu.models.gvp import GVP, GVPChain, TorchLinear
from pharmaforge_tpu.ops.neighbors import NeighborList

Array = jnp.ndarray


class SamplingTables(NamedTuple):
    """conv0 work that depends only on (timestep, pocket) — not on the noisy
    pharm coordinates — evaluated for ALL T chain steps in one batched pass
    before a sampling scan (leading axis T, in scan order; group level
    [T, G, P, ...] where G = batch / pocket_group_size):

    enc:      prot scalar-encoder output (masked)          [T, G, P, S]
    pp_s/v:   conv0 prot-prot message aggregates, pre-norm [T, G, P, S] /
              [T, G, P, V, 3] (pp adjacency + geometry are translation
              invariant and the prot state entering conv0 is (t, pocket)-
              only, so the whole pp chain hoists out of the scan)
    pp_cnt:   per-dst valid-edge counts (dynamic message norm) [T, G, P]
    pf_table: conv0 pf message chain's per-node source table  [T, G, P, S]
              (knn mode only; None in radius mode)
    """

    enc: Array
    pp_s: Array
    pp_v: Array
    pp_cnt: Array
    pf_table: Optional[Array]


def precompute_sampling_tables(dynamics: "PharmRecDynamics", params,
                               prot_h: Array, prot_mask: Array,
                               pp_edge: EdgeData,
                               t_values: Array) -> SamplingTables:
    """Build `SamplingTables` for a reverse chain.

    `prot_h`/`prot_mask`/`pp_edge` are at pocket-group level [G, P, ...];
    `t_values` [T] are the chain's timesteps in scan order. The T axis is
    folded into the batch axis, so the same module code that runs per step
    inside the scan runs ONCE here over T-fold larger operands — the op
    overhead that dominates the tiny per-step launches amortizes into a few
    large MXU ops (see docs/performance.md).
    """
    t_count = t_values.shape[0]
    g, p = prot_mask.shape
    s_dim = dynamics.n_hidden_scalars

    def tile(a):
        return jnp.broadcast_to(a[None], (t_count,) + a.shape).reshape(
            (t_count * g,) + a.shape[1:])

    def unflat(a):
        return a.reshape((t_count, g) + a.shape[1:])

    t_col = jnp.broadcast_to(t_values[:, None, None, None],
                             (t_count, g, p, 1)).reshape(t_count * g, p, 1)
    enc_in = jnp.concatenate([tile(prot_h), t_col], axis=-1)
    enc = ScalarEncoder(s_dim).apply({"params": params["prot_encoder"]},
                                     enc_in)
    enc = enc * tile(prot_mask)[..., None]

    from pharmaforge_tpu.models.conv import EdgeMessageChain, _aggregate
    chain = EdgeMessageChain(scalar_size=s_dim,
                             vector_size=dynamics.vector_size,
                             n_message_gvps=dynamics.n_message_gvps,
                             compute_dtype=dynamics.compute_dtype)

    # conv0's pp chain exists only when conv0 updates prot (with a pruned
    # prot tail and n_convs == 1 the single conv is pharm-only)
    s_agg = v_agg = cnt = None
    pp_params = params["conv_layers_0"].get("edge_message_fns_prot_pp_prot")
    if pp_params is not None:
        ed = EdgeData(mask=tile(pp_edge.mask), idx=tile(pp_edge.idx),
                      x_dir=tile(pp_edge.x_dir), d_rbf=tile(pp_edge.d_rbf))
        s_msg, v_msg = chain.apply({"params": pp_params}, enc, None, ed,
                                   src_vectors_zero=True)
        use_mean, _ = GVPMultiEdgeConv(
            message_norm=dynamics.message_norm)._norm_mode()
        s_agg, v_agg, cnt = _aggregate(s_msg.astype(jnp.float32), v_msg,
                                       ed.mask, mean=use_mean)
        s_agg, v_agg, cnt = unflat(s_agg), unflat(v_agg), unflat(cnt)

    pf_table = None
    if dynamics.pf_k and dynamics.pf_k > 0:
        pf_params = params["conv_layers_0"]["edge_message_fns_prot_pf_pharm"]
        pf_table = chain.apply({"params": pf_params}, enc, None, None,
                               src_vectors_zero=True, return_table=True)
        pf_table = unflat(pf_table)
    return SamplingTables(enc=unflat(enc), pp_s=s_agg, pp_v=v_agg,
                          pp_cnt=cnt, pf_table=pf_table)


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
    # with pocket groups (batched sampling), encode prot scalars ONCE per
    # pocket group instead of once per copy and keep them group-level
    # through conv0 (valid when conv0 is the compact conv: every prot
    # consumer — pp chain, pf gather, compact residual — reads group-folded)
    dedup_prot_encoder: bool = True
    # activation dtype for the conv message/update chains
    compute_dtype: str = "float32"
    # fused Pallas prot-prot message path for the per-copy middle convs
    # ("auto" = iff TPU backend; see models/conv.py GVPMultiEdgeConv)
    fused_pp: object = False

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
                 pocket_group_size: int = 1,
                 step_tables: Optional[tuple] = None,
                 pp_out: Optional[tuple] = None) -> Tuple[Array, Array]:
        """`pp_edge` optionally injects the precomputed prot-prot EdgeData
        (translation invariant, so the sampling chain computes it once for
        all T steps instead of once per step).

        `pocket_group_size` = C > 1 declares every C consecutive batch rows
        share an identical pocket AND an identical timestep t (the pocket-
        tiling layout of batched sampling, reference copy_graph +
        pharmacodiff.py:540-556). The first conv's prot-prot messages —
        which depend only on (prot_h, t, pp geometry) because the vector
        channels start at zero — are then computed once per group instead
        of once per copy; and when conv0 is also the compact conv (see
        `dedup_prot_encoder`), the prot scalar ENCODER runs once per group
        too and its per-copy [B, P, S] output never materializes.
        Numerically identical to the ungrouped path.

        `step_tables` injects one T-slice of `SamplingTables` (the
        (t, pocket)-only conv0 work hoisted out of a sampling scan):
        (enc [G,P,S], pp_s [G,P,S], pp_v [G,P,V,3], pp_cnt [G,P],
        pf_table [G,P,S] or None) at pocket-group level
        G = b / pocket_group_size. The prot encoder and conv0's pp message
        chain are skipped; the pf chain consumes its table group-folded.
        Requires deterministic mode (same restriction as the compact tail).
        Numerically equivalent to the unhoisted path."""
        cutoffs = dict(self.graph_cutoffs)

        # the compact-tail decision is needed up front: with step tables and
        # a compact conv0 the full-width [B,P,S] prot scalars are never
        # materialized at all (see below)
        compact_at = self.n_convs - 2 if (
            self.compact_prot_tail and self.prune_dead_prot_tail
            and self.n_convs >= 2 and self.pf_k and self.pf_k > 0
            and deterministic) else None

        # timestep concat + scalar encoding
        b, f = pharm_mask.shape
        p = prot_mask.shape[1]
        t_pharm = jnp.broadcast_to(t[:, None, None], (b, f, 1))
        pharm_scalars = ScalarEncoder(self.n_hidden_scalars, name="pharm_encoder")(
            jnp.concatenate([pharm_h_t, t_pharm], axis=-1))

        pp_s = pp_v = pp_cnt = pf_table = None
        prot_group = 1
        if step_tables is not None:
            if not deterministic:
                raise ValueError("step_tables requires deterministic mode")
            enc_g, pp_s, pp_v, pp_cnt, pf_table = step_tables
            if enc_g.shape[0] * pocket_group_size != b:
                raise ValueError(
                    f"step_tables group axis {enc_g.shape[0]} x "
                    f"pocket_group_size {pocket_group_size} != batch {b}")
            if compact_at == 0 and pf_table is not None:
                # conv0 is the compact conv: every prot consumer reads from
                # group-level tables (pp aggregates, pf table, residual
                # gather), so keep the scalars at group level — the [B,P,S]
                # broadcast never happens
                prot_scalars = enc_g
                prot_group = pocket_group_size
            elif pocket_group_size > 1:
                prot_scalars = jnp.repeat(enc_g, pocket_group_size, axis=0)
            else:
                prot_scalars = enc_g
        else:
            # batched sampling tiles one pocket over each group of C rows
            # with a group-uniform t: the encoder output is identical across
            # the copies. When conv0 is the compact conv, every consumer of
            # prot state reads it group-folded (pp chain, pf source table,
            # compact residual gather), so encode ONCE per group and never
            # materialize the [B,P,S] per-copy activation — at the bench
            # workload that activation write is the single most expensive
            # HBM transfer of the sampling step (docs/performance.md).
            group_enc = (self.dedup_prot_encoder and pocket_group_size > 1
                         and compact_at == 0)
            if group_enc:
                c = pocket_group_size
                g = b // c
                ph_g = prot_h.reshape((g, c) + prot_h.shape[1:])[:, 0]
                pm_g = prot_mask.reshape(g, c, p)[:, 0]
                t_g = t.reshape(g, c)[:, 0]
                t_prot = jnp.broadcast_to(t_g[:, None, None], (g, p, 1))
                prot_scalars = ScalarEncoder(self.n_hidden_scalars,
                                             name="prot_encoder")(
                    jnp.concatenate([ph_g, t_prot], axis=-1))
                prot_scalars = prot_scalars * pm_g[..., None]
                prot_group = c
            else:
                t_prot = jnp.broadcast_to(t[:, None, None], (b, p, 1))
                prot_scalars = ScalarEncoder(self.n_hidden_scalars,
                                             name="prot_encoder")(
                    jnp.concatenate([prot_h, t_prot], axis=-1))
                prot_scalars = prot_scalars * prot_mask[..., None]

        # zero-init vector channels (dynamics_gvp.py:156-173)
        v_pharm = jnp.zeros((b, f, self.vector_size, 3), pharm_scalars.dtype)
        v_prot = jnp.zeros((prot_scalars.shape[0], p, self.vector_size, 3),
                           prot_scalars.dtype)

        # mask padded slots so they contribute exact zeros everywhere
        # (precomputed tables arrive already masked)
        pharm_scalars = pharm_scalars * pharm_mask[..., None]

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

        # compact prot tail (decision hoisted above for the step-tables
        # path): when the LAST conv only updates pharm (its prot-side work
        # is pruned as dead), the conv before it is the final writer of prot
        # state, and that state is only ever read back through the next
        # conv's pf gathers at bundle['pf'].idx. Its prot update can
        # therefore run on just those F*K rows, and the subsequent pf
        # "gather" becomes a reshape. Exact per-atom numerics; knn-mode pf
        # only (radius mode has no narrow index list). Deterministic mode
        # only: with dropout active the draws would fall per compact slot
        # instead of per atom, so training keeps the full-width path.
        # pocket-copy correction dataflow (VERDICT r4 #3): conv0 emits the
        # fp-free "clean" prot state at group level; conv1 — the dominant
        # full-width per-copy pp chain at full scale — then runs one clean
        # group pass plus a sparse per-copy correction over the pp
        # out-edges of the pf-listed ("dirty") atoms. `pp_out` carries the
        # static out-edge transpose (models/edges.py build_pp_out_edges),
        # built once per sampling chain by diffusion.sample_given_receptor.
        from pharmaforge_tpu.models.conv import message_norm_is_dynamic
        corr = None
        corr_on = (pp_out is not None and pocket_group_size > 1
                   and deterministic and compact_at is not None
                   and compact_at >= 2
                   and self.pf_k is not None and self.pf_k > 0
                   and not message_norm_is_dynamic(self.message_norm))
        if corr_on:
            pf0 = bundle["pf"]
            slots = pf0.idx.reshape(b, -1).astype(jnp.int32)
            pf_valid = pf0.mask.reshape(b, -1)
            m_d = slots.shape[1]
            # first-occurrence dedup: a dirty atom listed twice must
            # contribute its out-edge corrections exactly once
            eq = slots[:, :, None] == slots[:, None, :]
            lower = jnp.tril(jnp.ones((m_d, m_d), bool), -1)
            dup = jnp.any(eq & lower[None] & pf_valid[:, None, :], axis=2)
            out_eid_g, out_mask_g = pp_out
            gidx = jnp.arange(b) // pocket_group_size
            eid = jnp.take_along_axis(out_eid_g[gidx], slots[..., None],
                                      axis=1)
            emk = jnp.take_along_axis(out_mask_g[gidx], slots[..., None],
                                      axis=1)
            corr = dict(slots=slots, slot_mask=pf_valid & ~dup,
                        out_eid=eid, out_mask=emk)

        clean = None
        from pharmaforge_tpu.models.edges import PreGatheredEdgeData
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            update_ntypes = ("pharm",) if (last and self.prune_dead_prot_tail) \
                else ("pharm", "prot")
            pf = bundle["pf"]
            prot_dst_idx = None
            if compact_at is not None and i == compact_at:
                prot_dst_idx = pf.idx.reshape(pf.idx.shape[0], -1)
            res = GVPMultiEdgeConv(
                scalar_size=self.n_hidden_scalars,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                n_update_gvps=self.n_update_gvps,
                message_norm=self.message_norm,
                dropout=self.dropout,
                compute_dtype=self.compute_dtype,
                fused_pp=self.fused_pp,
                name=f"conv_layers_{i}",
            )(node_feats, node_masks, bundle,
              deterministic=deterministic, update_ntypes=update_ntypes,
              # conv 0's source vectors are the zero-init channels: the
              # message chains skip their vector gathers/einsums entirely
              src_vectors_zero=(i == 0),
              # pocket-copy dedup is only valid while the prot state is
              # copy-independent, i.e. before the first fp update lands
              pp_src_group_size=pocket_group_size if i == 0 else 1,
              prot_dst_idx=prot_dst_idx,
              # conv0 (t, pocket)-only work hoisted out of the sampling scan
              pp_precomputed=(pp_s, pp_v, pp_cnt)
              if i == 0 and pp_s is not None else None,
              pf_table=pf_table if i == 0 else None,
              pf_src_group_size=pocket_group_size
              if i == 0 and (pf_table is not None or prot_group > 1) else 1,
              prot_feats_group_size=prot_group if i == 0 else 1,
              emit_clean_prot=corr_on and i == 0,
              pp_correction={**corr, "clean_h": clean[0],
                             "clean_v": clean[1]}
              if corr_on and i == 1 and clean is not None else None)
            if corr_on and i == 0:
                node_feats, clean = res
            else:
                node_feats = res
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
