import numpy as np
import jax
import pytest

from pharmaforge_tpu.interop.torch_import import (
    export_torch_state_dict,
    import_torch_state_dict,
)
from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
from tests.conftest import make_complex_batch
from tests.test_diffusion import tiny_config


def test_torch_state_dict_roundtrip(rng):
    """params -> torch-layout state dict -> params is the identity."""
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))

    state = export_torch_state_dict(params, cfg)
    # keys look like the reference module tree
    assert "dynamics.pharm_encoder.0.weight" in state
    assert ("dynamics.noise_predictor.conv_layers.0."
            "edge_message_fns.pharm_ff_pharm.0.Wh") in state
    assert "dynamics.noise_predictor.noise_predictor.to_scalar_output.weight" in state
    # torch Linear orientation: [out, in]
    w = state["dynamics.pharm_encoder.0.weight"]
    assert w.shape[0] == 32  # n_hidden_scalars rows

    back = import_torch_state_dict(state, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_imported_params_drive_the_model(rng):
    """An imported tree must be accepted by the denoiser apply."""
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    state = export_torch_state_dict(params, cfg)
    # scale every weight: the imported model must produce different outputs
    state = {k: v * 1.5 for k, v in state.items()}
    imported = import_torch_state_dict(state, cfg)

    t1, _ = model.loss(params, batch, jax.random.key(0), train=False)
    t2, _ = model.loss(imported, batch, jax.random.key(0), train=False)
    assert np.isfinite(float(t2))
    assert float(t1) != float(t2)


def test_import_missing_key_raises(rng):
    batch = make_complex_batch(rng, p=24, p_valid=(20, 16))
    cfg = tiny_config(n_convs=2)
    model = PharmacophoreDiffusion(cfg)
    params = jax.device_get(model.init_params(jax.random.key(3), batch))
    state = export_torch_state_dict(params, cfg)
    state.pop("dynamics.pharm_encoder.0.weight")
    with pytest.raises(KeyError):
        import_torch_state_dict(state, cfg)
