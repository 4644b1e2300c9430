from keras_rs_tpu.training.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from keras_rs_tpu.training.pipelined import (
    PipelinedTrainState,
    create_pipelined_train_state,
    dlrm_pipeline_fns,
    make_pipelined_train_step,
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
    "PipelinedTrainState",
    "TrainState",
    "Trainer",
    "create_pipelined_train_state",
    "create_train_state",
    "dlrm_pipeline_fns",
    "make_pipelined_train_step",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
