from pharmaforge_tpu.interop.torch_import import (
    config_from_hyper_parameters,
    export_torch_state_dict,
    import_torch_state_dict,
    load_torch_checkpoint,
    model_from_torch_checkpoint,
)
