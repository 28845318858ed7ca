"""Reference (torch/PL) checkpoint <-> flax parameter interop.

Maps the reference PharmacophoreDiff state_dict layout onto this framework's
parameter tree so trained reference checkpoints can be served on TPU and
denoising trajectories compared at numerical tolerance. Key layout of the
reference module tree (models/dynamics_gvp.py + models/gvp.py):

    dynamics.pharm_encoder.{0,2}.*                     Linear + LayerNorm
    dynamics.prot_encoder.{0,2}.*
    dynamics.noise_predictor.conv_layers.{i}.
        edge_message_fns.{src_etype_dst}.{j}.{Wh,Wu,to_feats_out.0.*,scalar_to_vector_gates.*}
        node_update_fns.{ntype}.{j}.*
        message_layer_norms.{ntype}.feat_norm.*
        update_layer_norms.{ntype}.feat_norm.*
    dynamics.noise_predictor.noise_predictor.
        gvps.{j}.*                                     noise head GVP chain
        to_scalar_output.*
    gamma.gamma                                        noise-schedule table

Orientation notes: torch Linear weights are [out, in] and flax kernels are
[in, out] (transposed); the GVP Wh/Wu matrices are stored [in, out] on both
sides (reference gvp.py:66-69); LayerNorm weight -> scale.

Dead-tail pruning: with `prune_dead_prot_tail` the final conv has no
prot-side parameters here; the matching reference weights are dead compute
and are skipped on import / emitted as zeros on export.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_GVP_LEAVES = {
    "Wh": ("Wh", False),
    "Wu": ("Wu", False),
    "to_feats_out.0.weight": ("to_feats_out.kernel", True),
    "to_feats_out.0.bias": ("to_feats_out.bias", False),
    "scalar_to_vector_gates.weight": ("scalar_to_vector_gates.kernel", True),
    "scalar_to_vector_gates.bias": ("scalar_to_vector_gates.bias", False),
}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _key_map(n_convs: int, n_message_gvps: int, n_update_gvps: int,
             n_noise_gvps: int, prune_dead_prot_tail: bool
             ) -> Dict[str, tuple]:
    """torch state_dict key -> (flax flat key, transpose?)."""
    etype_keys = ["pharm_ff_pharm", "prot_pf_pharm", "pharm_fp_prot",
                  "prot_pp_prot"]
    mapping: Dict[str, tuple] = {}

    for enc in ("pharm_encoder", "prot_encoder"):
        mapping[f"dynamics.{enc}.0.weight"] = (f"{enc}.linear.kernel", True)
        mapping[f"dynamics.{enc}.0.bias"] = (f"{enc}.linear.bias", False)
        mapping[f"dynamics.{enc}.2.weight"] = (f"{enc}.norm.scale", False)
        mapping[f"dynamics.{enc}.2.bias"] = (f"{enc}.norm.bias", False)

    for i in range(n_convs):
        last = i == n_convs - 1
        tprefix = f"dynamics.noise_predictor.conv_layers.{i}"
        fprefix = f"conv_layers_{i}"
        for ek in etype_keys:
            dst_is_prot = ek.endswith("_prot")
            if last and prune_dead_prot_tail and dst_is_prot:
                continue
            for j in range(n_message_gvps):
                for tk, (fk, tr) in _GVP_LEAVES.items():
                    mapping[f"{tprefix}.edge_message_fns.{ek}.{j}.{tk}"] = (
                        f"{fprefix}.edge_message_fns_{ek}.layers_{j}.{fk}", tr)
        for nt in ("pharm", "prot"):
            if last and prune_dead_prot_tail and nt == "prot":
                continue
            for j in range(n_update_gvps):
                for tk, (fk, tr) in _GVP_LEAVES.items():
                    mapping[f"{tprefix}.node_update_fns.{nt}.{j}.{tk}"] = (
                        f"{fprefix}.node_update_fns_{nt}.layers_{j}.{fk}", tr)
            for ln in ("message_layer_norms", "update_layer_norms"):
                mapping[f"{tprefix}.{ln}.{nt}.feat_norm.weight"] = (
                    f"{fprefix}.{ln}_{nt}.feat_norm.scale", False)
                mapping[f"{tprefix}.{ln}.{nt}.feat_norm.bias"] = (
                    f"{fprefix}.{ln}_{nt}.feat_norm.bias", False)

    head_t = "dynamics.noise_predictor.noise_predictor"
    for j in range(n_noise_gvps):
        for tk, (fk, tr) in _GVP_LEAVES.items():
            mapping[f"{head_t}.gvps.{j}.{tk}"] = (
                f"noise_predictor.gvps.layers_{j}.{fk}", tr)
    mapping[f"{head_t}.to_scalar_output.weight"] = (
        "noise_predictor.to_scalar_output.kernel", True)
    mapping[f"{head_t}.to_scalar_output.bias"] = (
        "noise_predictor.to_scalar_output.bias", False)
    return mapping


def import_torch_state_dict(state_dict: Dict[str, np.ndarray], config) -> dict:
    """Torch state_dict (numpy-valued) -> flax params tree for
    `PharmRecDynamics` built from `config` (a DiffusionConfig)."""
    mapping = _key_map(config.n_convs, config.n_message_gvps,
                       config.n_update_gvps, config.n_noise_gvps,
                       config.prune_dead_prot_tail)
    flat = {}
    for tkey, (fkey, transpose) in mapping.items():
        if tkey not in state_dict:
            raise KeyError(f"reference checkpoint missing key {tkey}")
        arr = np.asarray(state_dict[tkey], dtype=np.float32)
        flat[fkey] = arr.T.copy() if transpose else arr
    return _unflatten(flat)


def export_torch_state_dict(params: dict, config) -> Dict[str, np.ndarray]:
    """Flax params tree -> torch-layout state_dict (inverse of import)."""
    mapping = _key_map(config.n_convs, config.n_message_gvps,
                       config.n_update_gvps, config.n_noise_gvps,
                       config.prune_dead_prot_tail)
    flat = _flatten(params)
    out = {}
    for tkey, (fkey, transpose) in mapping.items():
        arr = np.asarray(flat[fkey])
        out[tkey] = arr.T.copy() if transpose else arr
    return out


def load_torch_checkpoint(path: str, config) -> dict:
    """Load a reference PL .ckpt file (requires torch) and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    return import_torch_state_dict(np_state, config)
