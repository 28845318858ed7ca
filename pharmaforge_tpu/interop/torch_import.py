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


def config_from_hyper_parameters(hparams: dict):
    """Reference PL `hyper_parameters` dict -> DiffusionConfig.

    The reference embeds its ctor kwargs in the checkpoint via
    `save_hyperparameters()` (pharmacodiff.py:78): top-level diffusion
    keys plus nested `graph_config` (= config['graph']) and
    `dynamics_config` (= config['dynamics']) — see the factory wiring in
    reference config_utils/load_from_config.py:16-30. Vestigial keys the
    reference itself swallows (`rl_dist_threshold` etc.) are ignored here
    the same way.
    """
    from pharmaforge_tpu.constants import PH_IDX_TO_TYPE
    from pharmaforge_tpu.models.diffusion import DiffusionConfig

    # the type ordering is load-bearing (one-hot axis, decode, metrics): a
    # checkpoint trained under a different ph_type_map would import cleanly
    # but decode every generated type under the wrong name
    tmap = hparams.get("ph_type_map")
    if tmap is not None and list(tmap) != list(PH_IDX_TO_TYPE):
        raise ValueError(
            f"checkpoint ph_type_map {list(tmap)} does not match this "
            f"framework's canonical ordering {list(PH_IDX_TO_TYPE)}; "
            f"serving it would permute pharmacophore-type semantics")

    kwargs = {}
    for k in ("pharm_nf", "rec_nf", "n_timesteps", "precision",
              "pharm_feat_norm_constant", "endpoint_param_feat",
              "endpoint_param_coord", "weighted_loss", "remove_com"):
        if k in hparams:
            kwargs[k] = hparams[k]
    for k in ("vector_size", "n_convs", "n_hidden_scalars", "message_norm",
              "n_message_gvps", "n_update_gvps", "n_noise_gvps", "dropout",
              "ff_k", "pf_k"):
        if k in (hparams.get("dynamics_config") or {}):
            kwargs[k] = hparams["dynamics_config"][k]
    cutoffs = (hparams.get("graph_config") or {}).get("graph_cutoffs")
    if cutoffs:
        kwargs["graph_cutoffs"] = tuple(
            (str(k), float(v)) for k, v in dict(cutoffs).items())
    return DiffusionConfig(**kwargs)


def _checkpoint_to_numpy_state(ckpt) -> Dict[str, np.ndarray]:
    state = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _check_gamma_table(np_state: Dict[str, np.ndarray], config,
                       atol: float = 1e-6) -> None:
    """Cross-check the checkpoint's saved noise-schedule buffer against the
    table this framework builds for `config` — a shape/hparam mismatch here
    means the imported weights would be run under the WRONG schedule."""
    saved = np_state.get("gamma.gamma")
    if saved is None:  # not a PL PharmacophoreDiff checkpoint; nothing to do
        return
    from pharmaforge_tpu.models.schedules import make_gamma_table
    ours = make_gamma_table(config.noise_schedule, config.n_timesteps,
                            precision=config.precision)
    saved = np.asarray(saved, np.float64).reshape(-1)
    if saved.shape != np.asarray(ours).shape:
        raise ValueError(
            f"checkpoint gamma table has {saved.shape[0] - 1} timesteps but "
            f"the config says n_timesteps={config.n_timesteps}")
    if not np.allclose(saved, ours, atol=atol):
        raise ValueError(
            "checkpoint gamma table does not match the "
            f"{config.noise_schedule} schedule at precision="
            f"{config.precision} (max abs diff "
            f"{np.abs(saved - ours).max():.3e})")


def load_torch_checkpoint(path: str, config) -> dict:
    """Load a reference PL .ckpt file (requires torch) and convert to a
    flax params tree for `config`. Validates the checkpoint's saved
    noise-schedule table against `config` when present."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    np_state = _checkpoint_to_numpy_state(ckpt)
    _check_gamma_table(np_state, config)
    return import_torch_state_dict(np_state, config)


def model_from_torch_checkpoint(path: str):
    """Load a reference PL .ckpt and build the full model from its embedded
    hyperparameters: returns (PharmacophoreDiffusion, params). This is the
    one-call path a reference user takes to serve their trained checkpoint
    on TPU (reference contract: `load_from_checkpoint`, test.py:113-115)."""
    import torch

    from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = ckpt.get("hyper_parameters")
    if hparams is None:
        raise ValueError(
            f"{path} has no 'hyper_parameters' entry; pass an explicit "
            f"config to load_torch_checkpoint instead")
    config = config_from_hyper_parameters(dict(hparams))
    np_state = _checkpoint_to_numpy_state(ckpt)
    _check_gamma_table(np_state, config)
    params = import_torch_state_dict(np_state, config)
    return PharmacophoreDiffusion(config), params
