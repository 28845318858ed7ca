from pharmaforge_tpu.interop.torch_import import (
    import_torch_state_dict,
    export_torch_state_dict,
    load_torch_checkpoint,
)
