from pemp_tpu.train.optim import build_optimizer, multistep_schedule, param_partition
from pemp_tpu.train.train_step import TrainState, make_eval_step, make_train_step

__all__ = [
    "build_optimizer",
    "multistep_schedule",
    "param_partition",
    "TrainState",
    "make_eval_step",
    "make_train_step",
]
