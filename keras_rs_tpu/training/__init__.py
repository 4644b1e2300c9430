from keras_rs_tpu.training.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from keras_rs_tpu.training.train_state import (
    Overwrite,
    TrainState,
    create_train_state,
    make_train_step,
)
from keras_rs_tpu.training.trainer import Trainer

__all__ = [
    "CheckpointManager",
    "Overwrite",
    "TrainState",
    "Trainer",
    "create_train_state",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
