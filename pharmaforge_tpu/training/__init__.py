from pharmaforge_tpu.training.optim import (
    ReduceLROnPlateau,
    make_optimizer,
)
from pharmaforge_tpu.training.train_state import TrainState, make_train_step
