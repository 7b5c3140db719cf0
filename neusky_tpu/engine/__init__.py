from neusky_tpu.engine.optimizers import (
    OptimizerGroupConfig,
    cosine_decay_schedule,
    exponential_decay_schedule,
    build_optimizer,
    default_neusky_optimizer_groups,
)
from neusky_tpu.engine.trainer import Trainer, TrainerConfig
