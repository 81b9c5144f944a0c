from splade_tpu.train.state import TrainState, create_optimizer, create_train_state
from splade_tpu.train.trainer import Trainer, make_train_step

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "Trainer",
    "make_train_step",
]
