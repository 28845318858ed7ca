"""A dgl/torch_cluster-free torch executor of the REFERENCE's numerics.

This is the trajectory-parity oracle (VERDICT r1 #2): an independent torch
re-implementation of the reference's denoiser + reverse-diffusion semantics,
built from its documented behavior at
/root/reference/pharmacoforge/models/gvp.py:12-550,
dynamics_gvp.py:10-245 and pharmacodiff.py:80-160,380-514 — with DGL's
message passing replaced by explicit edge lists and torch_cluster's
radius/knn replaced by brute-force equivalents with the same direction and
self-loop conventions. Weights come in the reference state_dict layout
(Linear [out, in]; GVP Wh/Wu [in, out]), so this also exercises the interop
conventions of pharmaforge_tpu.interop.torch_import end-to-end.

Single-graph (ragged) execution: no batching, loops over graphs instead —
clarity over speed, this runs on tiny fixtures only.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

# ---------------------------------------------------------------- numerics


def norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    """gvp.py:12-19 — clamped L2 norm."""
    out = torch.clamp(torch.sum(torch.square(x), axis, keepdims), min=eps)
    return torch.sqrt(out) if sqrt else out


def rbf(d, d_max=15.0, d_count=16):
    """gvp.py:26-41 — RBF embedding along a new trailing axis."""
    mu = torch.linspace(0.0, d_max, d_count).view(1, -1)
    sigma = d_max / d_count
    return torch.exp(-((d.unsqueeze(-1) - mu) / sigma) ** 2)


class RefGVP:
    """gvp.py:43-116 with weights from a reference-layout state dict."""

    def __init__(self, state, prefix, vectors_activation="sigmoid"):
        t = lambda k: torch.from_numpy(np.asarray(state[prefix + k],
                                                  np.float32))
        self.wh = t("Wh")                         # [v_in, h]
        self.wu = t("Wu")                         # [h, v_out]
        self.w1 = t("to_feats_out.0.weight")      # [out, in]
        self.b1 = t("to_feats_out.0.bias")
        self.wg = t("scalar_to_vector_gates.weight")
        self.bg = t("scalar_to_vector_gates.bias")
        self.vectors_activation = vectors_activation

    def __call__(self, feats, vectors):
        vh = torch.einsum("bvc,vh->bhc", vectors, self.wh)
        vu = torch.einsum("bhc,hu->buc", vh, self.wu)
        sh = norm_no_nan(vh)
        s = torch.cat([feats, sh], dim=-1)
        feats_out = F.silu(F.linear(s, self.w1, self.b1))
        gating = F.linear(feats_out, self.wg, self.bg).unsqueeze(-1)
        if self.vectors_activation == "sigmoid":
            gating = torch.sigmoid(gating)
        vectors_out = gating * vu
        return feats_out, vectors_out


class RefGVPChain:
    def __init__(self, gvps):
        self.gvps = gvps

    def __call__(self, feats, vectors):
        for g in self.gvps:
            feats, vectors = g(feats, vectors)
        return feats, vectors


def gvp_layer_norm(state, prefix, feats, vectors, eps=1e-5):
    """gvp.py:152-166 — trainable scalar LayerNorm, nontrainable vector
    norm."""
    w = torch.from_numpy(np.asarray(state[prefix + "weight"], np.float32))
    b = torch.from_numpy(np.asarray(state[prefix + "bias"], np.float32))
    normed = F.layer_norm(feats, feats.shape[-1:], w, b, eps=eps)
    vn = norm_no_nan(vectors, axis=-1, keepdims=True, sqrt=False)
    vn = torch.sqrt(torch.mean(vn, dim=-2, keepdim=True) + eps) + eps
    return normed, vectors / vn


# -------------------------------------------------- edge construction ----
# torch_cluster conventions per dynamics_gvp.py:187-227 and
# protein_pharm_dataset.py:234-236. Edges are (src_idx, dst_idx) arrays.


def radius_graph_edges(x, r):
    """radius_graph(x, r): for each center i, neighbors j != i with
    d(i,j) <= r, edges j -> i."""
    d = torch.cdist(x, x)
    src, dst = [], []
    n = x.shape[0]
    for i in range(n):
        for j in range(n):
            if j != i and d[i, j] <= r:
                src.append(j)
                dst.append(i)
    return np.asarray(src, np.int64), np.asarray(dst, np.int64)


def knn_graph_edges(x, k):
    """knn_graph(x, k): k nearest j != i per center i, edges j -> i."""
    d = torch.cdist(x, x).clone()
    d.fill_diagonal_(torch.inf)
    idx = torch.topk(d, min(k, x.shape[0] - 1), largest=False).indices
    src = idx.reshape(-1).numpy()
    dst = np.repeat(np.arange(x.shape[0]), idx.shape[1])
    return src, dst


def radius_pf_edges(pharm_x, prot_x, r):
    """radius(x=pharm, y=prot, r): pairs within r; reference adds them as
    prot -> pharm ('pf') and the reverse as 'fp'
    (dynamics_gvp.py:211-215)."""
    d = torch.cdist(prot_x, pharm_x)
    prot_idx, pharm_idx = (d <= r).nonzero(as_tuple=True)
    return prot_idx.numpy(), pharm_idx.numpy()


def knn_pf_edges(pharm_x, prot_x, k):
    """knn(x=prot, y=pharm, k): k nearest prots per pharm; added as
    prot -> pharm and the reverse (dynamics_gvp.py:202-209)."""
    d = torch.cdist(pharm_x, prot_x)
    idx = torch.topk(d, min(k, prot_x.shape[0]), largest=False).indices
    prot_idx = idx.reshape(-1).numpy()
    pharm_idx = np.repeat(np.arange(pharm_x.shape[0]), idx.shape[1])
    return prot_idx, pharm_idx


# ------------------------------------------------------------ the model --


class ReferenceDynamics:
    """dynamics_gvp.py:94-185 + gvp.py:343-550 on one ragged graph."""

    ETYPES = ["ff", "pf", "fp", "pp"]
    ETYPE_KEYS = {"ff": "pharm_ff_pharm", "pf": "prot_pf_pharm",
                  "fp": "pharm_fp_prot", "pp": "prot_pp_prot"}
    DST_NTYPE = {"ff": "pharm", "pf": "pharm", "fp": "prot", "pp": "prot"}
    SRC_NTYPE = {"ff": "pharm", "pf": "prot", "fp": "pharm", "pp": "prot"}

    def __init__(self, state, cfg):
        self.state = state
        self.cfg = cfg
        head = "dynamics.noise_predictor.noise_predictor."
        self.head_gvps = RefGVPChain([
            RefGVP(state, f"{head}gvps.{j}.",
                   vectors_activation=("identity"
                                       if j == cfg.n_noise_gvps - 1
                                       else "sigmoid"))
            for j in range(cfg.n_noise_gvps)])
        self.head_w = torch.from_numpy(np.asarray(
            state[head + "to_scalar_output.weight"], np.float32))
        self.head_b = torch.from_numpy(np.asarray(
            state[head + "to_scalar_output.bias"], np.float32))

    def _encode(self, which, scalars, t):
        p = f"dynamics.{which}_encoder."
        s = self.state
        w0 = torch.from_numpy(np.asarray(s[p + "0.weight"], np.float32))
        b0 = torch.from_numpy(np.asarray(s[p + "0.bias"], np.float32))
        w2 = torch.from_numpy(np.asarray(s[p + "2.weight"], np.float32))
        b2 = torch.from_numpy(np.asarray(s[p + "2.bias"], np.float32))
        x = torch.cat([scalars, torch.full((scalars.shape[0], 1), float(t))],
                      dim=1)
        x = F.silu(F.linear(x, w0, b0))
        return F.layer_norm(x, x.shape[-1:], w2, b2, eps=1e-5)

    def _norm_value(self, ntype, edges, n_nodes):
        """gvp.py:372-383,504-507: 'mean'->1.0, numeric->value, 0->dynamic
        average in-degree (+1) of the destination node type."""
        mn = self.cfg.message_norm
        if isinstance(mn, (tuple, dict)):
            mn = dict(mn)[ntype]
        if mn == "mean":
            return 1.0
        if mn == 0:
            n_in = sum(len(edges[et][0]) for et in self.ETYPES
                       if self.DST_NTYPE[et] == ntype)
            return n_in / n_nodes[ntype] + 1.0
        return float(mn)

    def __call__(self, pharm_h_t, pharm_x_t, prot_h, prot_x, t,
                 ff_edges, pf_edges, pp_edges):
        cfg = self.cfg
        h = {"pharm": self._encode("pharm", pharm_h_t, t),
             "prot": self._encode("prot", prot_h, t)}
        x = {"pharm": pharm_x_t, "prot": prot_x}
        v = {nt: torch.zeros(h[nt].shape[0], cfg.vector_size, 3)
             for nt in h}
        edges = {"ff": ff_edges, "pf": pf_edges,
                 "fp": (pf_edges[1], pf_edges[0]), "pp": pp_edges}
        n_nodes = {nt: h[nt].shape[0] for nt in h}
        agg_is_mean = cfg.message_norm == "mean"

        for i in range(cfg.n_convs):
            last = i == cfg.n_convs - 1
            cp = f"dynamics.noise_predictor.conv_layers.{i}."
            dst_ntypes = ["pharm"] if (last and cfg.prune_dead_prot_tail) \
                else ["pharm", "prot"]

            # per-edge-type messages + per-etype aggregation, cross-sum
            # (gvp.py:472-497,540-550)
            agg_s = {nt: torch.zeros_like(h[nt]) for nt in dst_ntypes}
            agg_v = {nt: torch.zeros_like(v[nt]) for nt in dst_ntypes}
            for et in self.ETYPES:
                dst_nt, src_nt = self.DST_NTYPE[et], self.SRC_NTYPE[et]
                if dst_nt not in agg_s:
                    continue
                src, dst = edges[et]
                chain = RefGVPChain([
                    RefGVP(self.state,
                           f"{cp}edge_message_fns.{self.ETYPE_KEYS[et]}.{j}.")
                    for j in range(cfg.n_message_gvps)])
                if len(src):
                    src_t = torch.from_numpy(src)
                    dst_t = torch.from_numpy(dst)
                    x_diff = x[src_nt][src_t] - x[dst_nt][dst_t]
                    dij = norm_no_nan(x_diff, keepdims=True) + 1e-8
                    x_dir = x_diff / dij
                    d = rbf(dij.squeeze(1), d_max=15.0, d_count=16)
                    vec_feats = torch.cat([x_dir.unsqueeze(1),
                                           v[src_nt][src_t]], dim=1)
                    scalar_feats = torch.cat([h[src_nt][src_t], d], dim=1)
                    ms, mv = chain(scalar_feats, vec_feats)
                    sum_s = torch.zeros_like(h[dst_nt])
                    sum_v = torch.zeros_like(v[dst_nt])
                    sum_s.index_add_(0, dst_t, ms)
                    sum_v.index_add_(0, dst_t, mv)
                    if agg_is_mean:  # per-etype dgl mean, 0 on empty rows
                        deg = torch.zeros(n_nodes[dst_nt])
                        deg.index_add_(0, dst_t, torch.ones(len(dst)))
                        deg = torch.clamp(deg, min=1.0)
                        sum_s = sum_s / deg[:, None]
                        sum_v = sum_v / deg[:, None, None]
                    agg_s[dst_nt] += sum_s
                    agg_v[dst_nt] += sum_v

            # residual + norms + update chain (gvp.py:499-532)
            for nt in dst_ntypes:
                z = self._norm_value(nt, edges, n_nodes)
                hs = h[nt] + agg_s[nt] / z
                vs = v[nt] + agg_v[nt] / z
                hs, vs = gvp_layer_norm(
                    self.state, f"{cp}message_layer_norms.{nt}.feat_norm.",
                    hs, vs)
                chain = RefGVPChain([
                    RefGVP(self.state, f"{cp}node_update_fns.{nt}.{j}.")
                    for j in range(cfg.n_update_gvps)])
                rs, rv = chain(hs, vs)
                hs = hs + rs
                vs = vs + rv
                hs, vs = gvp_layer_norm(
                    self.state, f"{cp}update_layer_norms.{nt}.feat_norm.",
                    hs, vs)
                h[nt], v[nt] = hs, vs

        # noise head (dynamics_gvp.py:10-42)
        hs, vs = self.head_gvps(h["pharm"], v["pharm"])
        eps_h = F.linear(hs, self.head_w, self.head_b)
        eps_x = vs.squeeze(1)
        return eps_h, eps_x


class ReferenceSampler:
    """pharmacodiff.py:380-514 on one ragged graph with injected noise."""

    def __init__(self, state, cfg, gamma_table):
        self.dynamics = ReferenceDynamics(state, cfg)
        self.cfg = cfg
        self.gamma = torch.from_numpy(np.asarray(gamma_table, np.float32))

    @staticmethod
    def _sigma(g):
        return torch.sqrt(torch.sigmoid(g))

    @staticmethod
    def _alpha(g):
        return torch.sqrt(torch.sigmoid(-g))

    def sample(self, prot_h, prot_x, n_pharm, init_pharm_com, noise):
        """Returns (final x, final h, per-step frames) — frames in the
        initial pocket frame like get_pos_feat_for_visual
        (pharmacodiff.py:360-378)."""
        cfg = self.cfg
        prot_h = torch.from_numpy(np.asarray(prot_h, np.float32))
        prot_x = torch.from_numpy(np.asarray(prot_x, np.float32))
        init_prot_com = prot_x.mean(dim=0)
        prot_x = prot_x - torch.from_numpy(
            np.asarray(init_pharm_com, np.float32))

        # static pp edges (protein_pharm_dataset.py:234-236), translation
        # invariant
        pp_edges = radius_graph_edges(prot_x, r=dict(cfg.graph_cutoffs)["pp"])

        x_t = torch.from_numpy(np.asarray(noise["x_T"], np.float32))
        h_t = torch.from_numpy(np.asarray(noise["h_T"], np.float32))
        frames = []
        T = cfg.n_timesteps
        cutoffs = dict(cfg.graph_cutoffs)

        for i, s in enumerate(range(T - 1, -1, -1)):
            gamma_s = self.gamma[s]
            gamma_t = self.gamma[s + 1]
            sigma2_tgs = -torch.expm1(F.softplus(gamma_s)
                                      - F.softplus(gamma_t))
            alpha_tgs = torch.exp(0.5 * (F.logsigmoid(-gamma_t)
                                         - F.logsigmoid(-gamma_s)))
            sigma_tgs = torch.sqrt(sigma2_tgs)
            sigma_s, sigma_t = self._sigma(gamma_s), self._sigma(gamma_t)

            # dynamic edges from the current noisy coords
            # (dynamics_gvp.py:176-177,187-227)
            if cfg.ff_k > 0:
                ff_edges = knn_graph_edges(x_t, cfg.ff_k)
            else:
                ff_edges = radius_graph_edges(x_t, cutoffs["ff"])
            if cfg.pf_k > 0:
                pf_edges = knn_pf_edges(x_t, prot_x, cfg.pf_k)
            else:
                pf_edges = radius_pf_edges(x_t, prot_x, cutoffs["pf"])

            t_val = (s + 1) / T
            pred_h, pred_x = self.dynamics(h_t, x_t, prot_h, prot_x, t_val,
                                           ff_edges, pf_edges, pp_edges)

            var_terms = sigma2_tgs / alpha_tgs / sigma_t
            sigma = sigma_tgs * sigma_s / sigma_t
            mu_pos = x_t / alpha_tgs - var_terms * pred_x
            mu_feat = h_t / alpha_tgs - var_terms * pred_h
            x_t = mu_pos + sigma * torch.from_numpy(
                np.asarray(noise["pos"][i], np.float32))
            h_t = mu_feat + sigma * torch.from_numpy(
                np.asarray(noise["feat"][i], np.float32))

            # pharmacophore COM removal (pharmacodiff.py:429,88-108)
            com = x_t.mean(dim=0)
            x_t = x_t - com
            prot_x = prot_x - com

            delta = init_prot_com - prot_x.mean(dim=0)
            frames.append((x_t + delta).numpy().copy())

        # finalize (pharmacodiff.py:479-488)
        x_0, h_0 = x_t, h_t
        prot_com = prot_x.mean(dim=0)
        x_0 = x_0 - prot_com
        prot_x = prot_x - prot_com
        x_0 = x_0 + init_prot_com
        h_0 = h_0 * cfg.pharm_feat_norm_constant
        return x_0.numpy(), h_0.numpy(), np.stack(frames)
