"""Joint Gaussian diffusion over pharmacophore coordinates and type one-hots.

TPU-native re-design of the reference `PharmacophoreDiff` LightningModule
(models/pharmacodiff.py:25-578). The diffusion process is identical —
Gaussian DDPM on both the (N,3) coordinates and the (N,6) one-hot type
vectors with argmax decoding, epsilon- or endpoint-parameterized losses, COM
removal keeping the process translation-equivariant — but the execution
model is jit-first:

* the training forward is a pure function of (params, batch, rng) suitable
  for `jax.jit` / `jax.grad` / data-parallel sharding;
* the full reverse chain is ONE `lax.scan` over T timesteps with zero host
  round-trips (the reference runs a Python loop with a CUDA sync per step,
  pharmacodiff.py:466-472); trajectory visualization falls out as stacked
  scan outputs instead of per-step `.to('cpu')` copies
  (pharmacodiff.py:360-378).

Noise-schedule lookups use integer indexing into the gamma table: the
reference evaluates gamma(t) as table[round(t*T)] (pharmacodiff.py:666-668)
and only ever calls it with t = k/T, so indexing by k is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pharmaforge_tpu.data.batch import PharmComplexBatch
from pharmaforge_tpu.models.dynamics import PharmRecDynamics
from pharmaforge_tpu.models.schedules import make_gamma_table
from pharmaforge_tpu.ops.geometry import masked_com
from pharmaforge_tpu.ops.neighbors import build_pp_neighbors

Array = jnp.ndarray


def sigma_of_gamma(gamma: Array) -> Array:
    """sigma = sqrt(sigmoid(gamma)) (reference pharmacodiff.py:140-142)."""
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def alpha_of_gamma(gamma: Array) -> Array:
    """alpha = sqrt(sigmoid(-gamma)) (reference pharmacodiff.py:144-146)."""
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def sigma_and_alpha_t_given_s(gamma_t: Array, gamma_s: Array):
    """Transition parameters of p(z_t | z_s)
    (reference pharmacodiff.py:148-160, math from DiffSBDD)."""
    sigma2_t_given_s = -jnp.expm1(jax.nn.softplus(gamma_s)
                                  - jax.nn.softplus(gamma_t))
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    alpha_s = jnp.exp(0.5 * log_alpha2_s)
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s, alpha_s


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Hyperparameters of the diffusion process + denoiser.

    Field names follow the reference config schema (configs/dev.yml) so that
    `config_utils` can build this directly from the YAML dict.
    """

    pharm_nf: int = 6
    rec_nf: int = 11
    n_timesteps: int = 1000
    precision: float = 1e-4
    noise_schedule: str = "polynomial_2"  # hardcoded in reference, pharmacodiff.py:64
    pharm_feat_norm_constant: float = 1.0
    endpoint_param_feat: bool = False
    endpoint_param_coord: bool = False
    weighted_loss: bool = False
    remove_com: bool = True
    # denoiser
    vector_size: int = 16
    n_convs: int = 4
    n_hidden_scalars: int = 128
    message_norm: Any = 1
    n_message_gvps: int = 3
    n_update_gvps: int = 2
    n_noise_gvps: int = 3
    dropout: float = 0.0
    ff_k: int = 0
    pf_k: int = 0
    prune_dead_prot_tail: bool = True
    compact_prot_tail: bool = True
    dedup_prot_encoder: bool = True
    graph_cutoffs: Tuple[Tuple[str, float], ...] = (
        ("pp", 3.5), ("pf", 8.0), ("fp", 8.0), ("ff", 9.0))
    # TPU-specific: static width of the prot-prot neighbor list. The
    # reference caps pp degree at 100 (protein_pharm_dataset.py:235); real
    # heavy-atom coordination at 3.5 A is ~9-11 (mean). Quantified at
    # worst-case packing density (tests/test_torch_cluster_golden.py::
    # test_pp_truncation_quantified_at_protein_packing_density): nearest-16
    # drops <=1.3% of edges — always the farthest of their destination —
    # and k_max=20 is fully lossless even there. 16 bounds the gathered
    # edge tensor (pp edges dominate step time; scripts/perf_ablation.py);
    # set graph.pp_k_max: 20 in the config for guaranteed losslessness at
    # a measured -3.4% sampling throughput (2943 -> 2842 samples/s,
    # interleaved A/B at the bench workload).
    pp_k_max: int = 16
    # activation dtype inside the message/update chains: 'bfloat16' halves
    # the HBM traffic of the edge tensors (params and reductions stay fp32)
    compute_dtype: str = "float32"
    # fused Pallas prot-prot message kernel for the per-copy MIDDLE convs
    # (ops/pallas/pp_message.py). Those convs are what makes the full-scale
    # step (n_convs=4, reference gvp.py default) HBM-bandwidth-bound: each
    # materializes ~[B, P, 16, 128]-class edge activations per chain stage
    # in plain XLA. "auto" (default) enables the kernel iff the backend is
    # TPU, resolved at trace time so model construction stays device-free;
    # True/False force it; "interpret" runs it interpreted (CPU tests).
    # n_convs=2 configs (dev) have no middle convs and are unaffected.
    fused_pp: Any = "auto"
    # unroll factor of the reverse-chain lax.scan. Measured on v5e at the
    # bench workload (4 pockets x 30 samples, 230 atoms) with interleaved
    # in-process A/B: unroll=1 2436 samples/sec vs unroll=4 2335 — the
    # while-loop sequencing overhead is already negligible against the
    # ~0.4 ms step, and unrolling only grows the program. Left as a knob
    # because the tradeoff may flip at much smaller step sizes.
    sample_scan_unroll: int = 1
    # hoist the (timestep, pocket)-only conv0 work — prot encoder, the whole
    # prot-prot message chain, the pf chain's source table — out of the
    # reverse-chain scan into ONE batched precompute over all T steps
    # (models/dynamics.py::precompute_sampling_tables). Numerically
    # equivalent (pinned by tests/test_step_tables.py). Measured on v5e at
    # the bench workload (4 pockets x 30 copies, T=100): ~3-5% faster in
    # single-call LATENCY mode but ~5% SLOWER in pipelined throughput mode
    # (scripts/ab_knob.py; the per-step work it removes was already
    # hidden by dispatch pipelining, while the per-step table slices break
    # some XLA fusion). Default off — the headline sweep/serving regime is
    # pipelined; flip on for latency-sensitive single-shot generation.
    # Costs ~T x G x P x (3S + 3V) floats of HBM for the tables, so it
    # auto-disables above `precompute_table_budget` bytes.
    precompute_step_tables: bool = False
    precompute_table_budget: int = 4 << 30

    @classmethod
    def from_config(cls, config: dict) -> "DiffusionConfig":
        """Build from a merged YAML config dict (reference
        load_from_config.py:6-32)."""
        diff = dict(config.get("diffusion", {}))
        dyn = dict(config.get("dynamics", {}))
        graph = dict(config.get("graph", {}))
        dataset = config.get("dataset", {})
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs: Dict[str, Any] = {}
        kwargs["pharm_nf"] = len(dataset.get("ph_type_map", range(6)))
        kwargs["rec_nf"] = len(dataset.get("prot_elements", range(11)))
        for src in (diff, dyn):
            for k, v in src.items():
                if k in known:
                    kwargs[k] = v
        cutoffs = graph.get("graph_cutoffs")
        if cutoffs:
            kwargs["graph_cutoffs"] = tuple(sorted(
                (k, float(v)) for k, v in cutoffs.items()))
        if "pp_k_max" in graph:
            kwargs["pp_k_max"] = graph["pp_k_max"]
        mn = kwargs.get("message_norm")
        if isinstance(mn, dict):
            kwargs["message_norm"] = tuple(sorted(mn.items()))
        return cls(**kwargs)

    def make_dynamics(self) -> PharmRecDynamics:
        mn = self.message_norm
        if isinstance(mn, dict):
            mn = tuple(sorted(mn.items()))
        return PharmRecDynamics(
            n_pharm_scalars=self.pharm_nf,
            n_prot_scalars=self.rec_nf,
            vector_size=self.vector_size,
            n_convs=self.n_convs,
            n_hidden_scalars=self.n_hidden_scalars,
            message_norm=mn,
            graph_cutoffs=tuple(self.graph_cutoffs),
            n_message_gvps=self.n_message_gvps,
            n_update_gvps=self.n_update_gvps,
            n_noise_gvps=self.n_noise_gvps,
            dropout=self.dropout,
            ff_k=self.ff_k,
            pf_k=self.pf_k,
            prune_dead_prot_tail=self.prune_dead_prot_tail,
            compact_prot_tail=self.compact_prot_tail,
            dedup_prot_encoder=self.dedup_prot_encoder,
            compute_dtype=self.compute_dtype,
            fused_pp=self.fused_pp,
        )


class PharmacophoreDiffusion:
    """Functional diffusion model: stateless methods over explicit params."""

    def __init__(self, config: DiffusionConfig):
        self.config = config
        self.dynamics = config.make_dynamics()
        # host-side numpy: constructing the model must NOT touch the device.
        # The outage-retry wrappers (bench.py::_retry_device,
        # __graft_entry__::_retry_backend) build the model once and rebuild
        # device state per attempt after a backend reset; a device-resident
        # table here would (a) move the first device touch outside the
        # retried region and (b) pin the dead backend alive across resets.
        # jnp ops convert it to an on-device constant at trace time.
        self.gamma_table = make_gamma_table(
            config.noise_schedule, config.n_timesteps, config.precision)
        self.cutoffs = dict(config.graph_cutoffs)

    # ---------------------------------------------------------------- init

    def init_params(self, key: jax.Array, batch: PharmComplexBatch):
        t = jnp.zeros((batch.batch_size,), jnp.float32)
        pp = build_pp_neighbors(jnp.asarray(batch.prot_x),
                                jnp.asarray(batch.prot_mask),
                                self.cutoffs["pp"], self.config.pp_k_max)
        variables = self.dynamics.init(
            {"params": key, "dropout": key},
            jnp.asarray(batch.pharm_h), jnp.asarray(batch.pharm_x),
            jnp.asarray(batch.pharm_mask),
            jnp.asarray(batch.prot_h), jnp.asarray(batch.prot_x),
            jnp.asarray(batch.prot_mask), t, pp, deterministic=True)
        return variables["params"]

    # ------------------------------------------------------------- training

    def loss(self, params, batch: PharmComplexBatch, key: jax.Array,
             train: bool = True, phase: str = "train"):
        """Forward diffusion + denoiser + losses.

        Mirrors PharmacophoreDiff.forward (pharmacodiff.py:162-243) with
        masked reductions instead of ragged per-node ops.
        Returns (total_loss, dict of losses+metrics).
        """
        cfg = self.config
        b = batch.batch_size
        pharm_mask = jnp.asarray(batch.pharm_mask)
        prot_mask = jnp.asarray(batch.prot_mask)
        fmask = pharm_mask.astype(jnp.float32)

        # normalize features (pharmacodiff.py:80-82,168)
        h0 = jnp.asarray(batch.pharm_h) / cfg.pharm_feat_norm_constant
        x0 = jnp.asarray(batch.pharm_x)
        prot_x = jnp.asarray(batch.prot_x)
        prot_h = jnp.asarray(batch.prot_h)

        # pp neighbors + geometry: translation-invariant, from the raw
        # pocket coords (fused selection kernel on TPU, models/edges.py)
        from pharmaforge_tpu.models.edges import build_pp_edge
        pp, pp_edge = build_pp_edge(prot_x, prot_mask, self.cutoffs["pp"],
                                    cfg.pp_k_max)

        # remove pharmacophore COM from the complex (pharmacodiff.py:179)
        com = masked_com(x0, pharm_mask)
        x0 = (x0 - com[:, None]) * fmask[..., None]
        prot_x = prot_x - com[:, None]

        # clean copies for endpoint losses/metrics (pharmacodiff.py:182)
        x0_clean, h0_clean = x0, h0

        k_t, k_ex, k_eh, k_drop = jax.random.split(key, 4)
        t_int = jax.random.randint(k_t, (b,), 0, cfg.n_timesteps)
        t = t_int.astype(jnp.float32) / cfg.n_timesteps

        eps_x = jax.random.normal(k_ex, x0.shape) * fmask[..., None]
        eps_h = jax.random.normal(k_eh, h0.shape) * fmask[..., None]

        gamma_t = jnp.asarray(self.gamma_table)[t_int]         # [B]
        alpha_t = alpha_of_gamma(gamma_t)[:, None, None]
        sigma_t = sigma_of_gamma(gamma_t)[:, None, None]

        x_t = alpha_t * x0 + sigma_t * eps_x
        h_t = alpha_t * h0 + sigma_t * eps_h

        sampled_com = jnp.zeros((b, 3), x_t.dtype)
        if cfg.remove_com:
            sampled_com = masked_com(x_t, pharm_mask)
            x_t = (x_t - sampled_com[:, None]) * fmask[..., None]
            prot_x = prot_x - sampled_com[:, None]

        h_dyn, x_dyn = self.dynamics.apply(
            {"params": params}, h_t, x_t, pharm_mask, prot_h, prot_x,
            prot_mask, t, pp, deterministic=not train, pp_edge=pp_edge,
            rngs={"dropout": k_drop} if train else None)

        # losses (pharmacodiff.py:204-232)
        if cfg.endpoint_param_feat:
            h0_pred = h_dyn
            labels = jnp.argmax(h0_clean, axis=-1)
            logz = jax.nn.log_softmax(h_dyn, axis=-1)
            h_loss = -jnp.take_along_axis(logz, labels[..., None],
                                          axis=-1)[..., 0]
        else:
            h_loss = jnp.sum(jnp.square(eps_h - h_dyn), axis=-1)
            h0_pred = (h_t - sigma_t * h_dyn) / alpha_t

        if cfg.endpoint_param_coord:
            if cfg.remove_com:
                x_dyn = x_dyn + sampled_com[:, None]
            x0_pred = x_dyn
            x_loss = jnp.sum(jnp.square(x0_pred - x0_clean), axis=-1)
        else:
            x_loss = jnp.sum(jnp.square(eps_x - x_dyn), axis=-1)
            x0_pred = (x_t - sigma_t * x_dyn) / alpha_t

        t_per_node = t[:, None]
        weight_metric = (1.0 - t_per_node) * fmask
        weight_loss = fmask if not cfg.weighted_loss else weight_metric

        h_loss = jnp.sum(h_loss * weight_loss)
        x_loss = jnp.sum(x_loss * weight_loss)

        n_valid = jnp.maximum(jnp.sum(fmask), 1.0)
        losses = {
            f"{phase} pos loss": x_loss / (n_valid * 3.0),
            f"{phase} feat loss": h_loss / (n_valid * float(cfg.pharm_nf)),
        }
        total = losses[f"{phase} pos loss"] + losses[f"{phase} feat loss"]
        losses[f"{phase} total loss"] = total

        # metrics (pharmacodiff.py:234-239), gradient-free
        sg = jax.lax.stop_gradient
        pos_err = jnp.sum(jnp.square(sg(x0_pred) - x0_clean), axis=-1)
        pred_cls = jnp.argmax(sg(h0_pred), axis=-1)
        true_cls = jnp.argmax(h0_clean, axis=-1)
        acc = (pred_cls == true_cls).astype(jnp.float32)
        metrics = {
            f"{phase} position error": jnp.sum(pos_err * fmask) / n_valid,
            f"{phase} weighted position error":
                jnp.sum(pos_err * weight_metric) / n_valid,
            f"{phase} accuracy": jnp.sum(acc * fmask) / n_valid,
            f"{phase} weighted accuracy":
                jnp.sum(acc * weight_metric) / n_valid,
        }
        metrics[f"{phase} total error"] = (
            metrics[f"{phase} position error"] + 1.0
            - metrics[f"{phase} accuracy"])
        metrics[f"{phase} weighted total error"] = (
            metrics[f"{phase} weighted position error"] + 1.0
            - metrics[f"{phase} weighted accuracy"])
        return total, {**losses, **metrics}

    # ------------------------------------------------------------- sampling

    def sample_given_receptor(self, params, batch: PharmComplexBatch,
                              key: jax.Array,
                              init_pharm_com: Optional[Array] = None,
                              visualize_trajectory: bool = False,
                              noise: Optional[Dict[str, Array]] = None,
                              pocket_group_size: int = 1,
                              pp_k_out: int = 0):
        """Full reverse DDPM chain as one lax.scan
        (reference pharmacodiff.py:433-514).

        Returns a dict with final pharm_x/pharm_h in the original pocket
        frame, plus stacked trajectory frames when requested.

        `noise` optionally injects every random draw of the chain — the
        harness for matching reference-checkpoint denoising trajectories at
        numerical tolerance (same weights + same noise => same trajectory up
        to float error). Keys: 'x_T' [B,F,3], 'h_T' [B,F,nf] initial
        latents; 'pos'/'feat' [T,B,F,...] per-step posterior noise ordered
        by loop iteration (i=0 is s=T-1).

        `pocket_group_size` = C > 1 declares every C consecutive batch rows
        carry an identical pocket — the tile_pocket layout of "N samples per
        pocket" generation (reference copy_graph, unorganized_utils.py:28-81).
        The denoiser then computes the dominant prot-prot message work once
        per pocket group per step instead of once per copy; results are
        numerically identical to pocket_group_size=1. All timesteps share
        one t across the batch here, so the group-uniformity requirement on
        t holds by construction.

        `pp_k_out` > 0 (static) additionally enables the middle-conv
        pocket-copy CORRECTION path (models/conv.py `pp_correction`): the
        pp out-edge transpose is built once here from the static pp graph
        and the denoiser then computes conv1's dominant per-copy pp chain
        as a group-level clean pass + sparse per-copy correction. Exact
        only when pp_k_out >= the pp graph's max out-degree — callers probe
        that with `max_pp_out_degree` (PocketSampler does); the value is a
        static shape, hence an argument rather than data.
        """
        cfg = self.config
        pharm_mask = jnp.asarray(batch.pharm_mask)
        prot_mask = jnp.asarray(batch.prot_mask)
        fmask = pharm_mask.astype(jnp.float32)[..., None]
        b, f = pharm_mask.shape
        if b % pocket_group_size:
            raise ValueError(f"batch {b} not divisible by "
                             f"pocket_group_size {pocket_group_size}")

        prot_x0 = jnp.asarray(batch.prot_x)
        prot_h = jnp.asarray(batch.prot_h)

        init_prot_com = masked_com(prot_x0, prot_mask)
        if init_pharm_com is None:
            init_pharm_com = init_prot_com
        init_pharm_com = jnp.asarray(init_pharm_com)

        # pp neighbor list AND geometry are translation invariant: build both
        # once from the raw coords and reuse across all T steps. With pocket
        # groups the rows within a group are identical, so build on the
        # group representatives and broadcast — the sort + row-gather are
        # the two most expensive once-per-call ops at full batch (profiled
        # ~3.7 ms of a ~45 ms call at 4x30 rows), and a broadcast is pure
        # sequential HBM writes. Bit-exact: identical inputs per group.
        from pharmaforge_tpu.models.edges import (GroupedEdgeData,
                                                  build_pp_edge)
        if pocket_group_size > 1:
            g = b // pocket_group_size
            reps = lambda a: a.reshape((g, pocket_group_size) + a.shape[1:])[:, 0]
            rep = lambda a: jnp.repeat(a, pocket_group_size, axis=0)
            pp_g, ed_g = build_pp_edge(reps(prot_x0), reps(prot_mask),
                                       self.cutoffs["pp"], cfg.pp_k_max)
            pp = type(pp_g)(idx=rep(pp_g.idx), mask=rep(pp_g.mask))
            # keep the pp edge at GROUP level: conv0 consumes it group-
            # level anyway, the fused middle-conv kernel reuses it across
            # the copies, and the unfused path expands it on demand
            # (exactly the broadcast that used to happen here)
            pp_edge = GroupedEdgeData(mask=ed_g.mask, idx=ed_g.idx,
                                      x_dir=ed_g.x_dir, d_rbf=ed_g.d_rbf,
                                      copies=pocket_group_size)
            prot_h_g, prot_mask_g, pp_edge_g = reps(prot_h), reps(prot_mask), ed_g
        else:
            pp, pp_edge = build_pp_edge(prot_x0, prot_mask,
                                        self.cutoffs["pp"], cfg.pp_k_max)
            prot_h_g, prot_mask_g, pp_edge_g = prot_h, prot_mask, pp_edge

        pp_out = None
        from pharmaforge_tpu.models.dynamics import \
            PharmRecDynamics as _PRD
        if pp_k_out and pocket_group_size > 1 \
                and isinstance(self.dynamics, _PRD):
            # static across the chain (pp adjacency is coordinate-frozen):
            # one transpose build amortized over all T steps
            from pharmaforge_tpu.models.edges import build_pp_out_edges
            pp_out = build_pp_out_edges(pp_edge_g, int(pp_k_out))

        prot_x = prot_x0 - init_pharm_com[:, None]

        k_x, k_h, k_chain = jax.random.split(key, 3)
        if noise is not None and "x_T" in noise:
            x_t = jnp.asarray(noise["x_T"]) * fmask
            h_t = jnp.asarray(noise["h_T"]) * fmask
        else:
            x_t = jax.random.normal(k_x, (b, f, 3)) * fmask
            h_t = jax.random.normal(k_h, (b, f, cfg.pharm_nf)) * fmask
        x_init, h_init, prot_x_init = x_t, h_t, prot_x

        gamma = jnp.asarray(self.gamma_table)
        n_t = cfg.n_timesteps

        # hoist the (t, pocket)-only conv0 work out of the scan: one batched
        # pass over all T steps instead of T tiny per-step launches
        steps = jnp.arange(n_t - 1, -1, -1)
        tables = None
        from pharmaforge_tpu.models.dynamics import PharmRecDynamics
        if cfg.precompute_step_tables and isinstance(self.dynamics,
                                                     PharmRecDynamics):
            g_rows = prot_mask_g.shape[0]
            s_dim, v_dim = cfg.n_hidden_scalars, cfg.vector_size
            table_bytes = n_t * g_rows * prot_mask_g.shape[1] * (
                4 * (2 * s_dim + 3 * v_dim + 1)
                + (2 if cfg.compute_dtype == "bfloat16" else 4) * s_dim)
            if table_bytes <= cfg.precompute_table_budget:
                from pharmaforge_tpu.models.dynamics import \
                    precompute_sampling_tables
                t_values = (steps + 1).astype(jnp.float32) / n_t
                tables = precompute_sampling_tables(
                    self.dynamics, params, prot_h_g, prot_mask_g,
                    pp_edge_g, t_values)

        def frame(x_t, h_t, prot_x):
            """Trajectory frame in the initial pocket frame
            (pharmacodiff.py:360-378)."""
            prot_com = masked_com(prot_x, prot_mask)
            delta = init_prot_com - prot_com
            return (x_t + delta[:, None]) * fmask, \
                   h_t * cfg.pharm_feat_norm_constant

        def step(carry, scan_in):
            s, step_noise, step_tables = scan_in
            x_t, h_t, prot_x, key = carry
            key, k_px, k_ph = jax.random.split(key, 3)

            gamma_s = gamma[s]
            gamma_t = gamma[s + 1]
            (sigma2_tgs, sigma_tgs, alpha_tgs,
             alpha_s) = sigma_and_alpha_t_given_s(gamma_t, gamma_s)
            sigma_s = sigma_of_gamma(gamma_s)
            sigma_t = sigma_of_gamma(gamma_t)

            t_arr = jnp.full((b,), (s + 1).astype(jnp.float32) / n_t)
            kw = {} if step_tables is None else dict(
                step_tables=tuple(step_tables))
            if pp_out is not None:
                kw["pp_out"] = pp_out
            pred_h, pred_x = self.dynamics.apply(
                {"params": params}, h_t, x_t, pharm_mask, prot_h, prot_x,
                prot_mask, t_arr, pp, deterministic=True, pp_edge=pp_edge,
                pocket_group_size=pocket_group_size, **kw)

            var_terms = sigma2_tgs / alpha_tgs / sigma_t
            sigma = sigma_tgs * sigma_s / sigma_t

            if cfg.endpoint_param_coord:
                mu_pos = (alpha_tgs * (sigma_s ** 2) / (sigma_t ** 2)) * x_t \
                    + (alpha_s * sigma2_tgs / (sigma_t ** 2)) * pred_x
            else:
                mu_pos = x_t / alpha_tgs - var_terms * pred_x
            if cfg.endpoint_param_feat:
                mu_feat = (alpha_tgs * (sigma_s ** 2) / (sigma_t ** 2)) * h_t \
                    + (alpha_s * sigma2_tgs / (sigma_t ** 2)) * pred_h
            else:
                mu_feat = h_t / alpha_tgs - var_terms * pred_h

            # noise is added at EVERY step including s=0
            # (reference pharmacodiff.py:423-426)
            if step_noise is None:
                pos_noise = jax.random.normal(k_px, x_t.shape)
                feat_noise = jax.random.normal(k_ph, h_t.shape)
            else:
                pos_noise, feat_noise = step_noise
            x_t = mu_pos + sigma * pos_noise
            h_t = mu_feat + sigma * feat_noise
            x_t = x_t * fmask
            h_t = h_t * fmask

            com = masked_com(x_t, pharm_mask)
            x_t = (x_t - com[:, None]) * fmask
            prot_x = prot_x - com[:, None]

            carry = (x_t, h_t, prot_x, key)
            if visualize_trajectory:
                return carry, frame(x_t, h_t, prot_x)
            return carry, None

        if noise is not None and "pos" in noise:
            scan_in = (steps, (jnp.asarray(noise["pos"]),
                               jnp.asarray(noise["feat"])), tables)
        else:
            scan_in = (steps, None, tables)
        (x_t, h_t, prot_x, _), traj = jax.lax.scan(
            step, (x_t, h_t, prot_x, k_chain), scan_in,
            unroll=max(1, cfg.sample_scan_unroll))

        # finalize (pharmacodiff.py:479-488)
        x_0, h_0 = x_t, h_t
        prot_com = masked_com(prot_x, prot_mask)
        x_0 = (x_0 - prot_com[:, None]) * fmask
        prot_x = prot_x - prot_com[:, None]
        x_0 = (x_0 + init_prot_com[:, None]) * fmask
        prot_x = prot_x + init_prot_com[:, None]
        h_0 = h_0 * cfg.pharm_feat_norm_constant

        out = {"pharm_x": x_0, "pharm_h": h_0, "pharm_mask": pharm_mask}
        if visualize_trajectory:
            x0_frame, h0_frame = frame(x_init, h_init, prot_x_init)
            traj_x = jnp.concatenate([x0_frame[None], traj[0]], axis=0)
            traj_h = jnp.concatenate([h0_frame[None], traj[1]], axis=0)
            out["traj_x"] = traj_x  # [T+1, B, F, 3]
            out["traj_h"] = traj_h  # [T+1, B, F, pharm_nf]
        return out
