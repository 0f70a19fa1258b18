"""Training utilities: optimizers, schedules, EMA, importance sampling,
checkpointing."""

from world_modelz_tpu.train.schedules import (
    warmup_cosine_schedule,
    step_decay_schedule,
    host_schedule,
)
from world_modelz_tpu.train.ema import ema_init, ema_update
from world_modelz_tpu.train.importance import (
    LossAwareSamplerState,
    loss_aware_init,
    loss_aware_sample,
    loss_aware_update,
    loss_aware_weights,
    uniform_sample,
)
from world_modelz_tpu.train.optim import make_optimizer, global_grad_norm
from world_modelz_tpu.train.guard import (
    CheckpointGuard,
    RestartManager,
    finite_guard,
    reject_nonfinite,
    tree_all_finite,
)

__all__ = [
    "warmup_cosine_schedule",
    "step_decay_schedule",
    "host_schedule",
    "ema_init",
    "ema_update",
    "LossAwareSamplerState",
    "loss_aware_init",
    "loss_aware_sample",
    "loss_aware_update",
    "loss_aware_weights",
    "uniform_sample",
    "make_optimizer",
    "global_grad_norm",
    "CheckpointGuard",
    "RestartManager",
    "finite_guard",
    "reject_nonfinite",
    "tree_all_finite",
]
