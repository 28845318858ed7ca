from pharmaforge_tpu.config.cmdline import (
    register_hyperparameter_args,
    merge_config_and_args,
)
from pharmaforge_tpu.config.load_from_config import (
    model_from_config,
    data_module_from_config,
)
