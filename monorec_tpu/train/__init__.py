from monorec_tpu.train.state import TrainState, create_train_state, make_optimizer
from monorec_tpu.train.trainer import Trainer
from monorec_tpu.train.monorec_trainer import MonoRecTrainer

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "Trainer",
    "MonoRecTrainer",
]
