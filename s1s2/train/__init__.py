"""Training: jitted train step, losses, EMA, t-samplers, checkpointing."""

from s1s2.train.loss import masked_mse_per_channel
from s1s2.train.loop import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    sample_timesteps,
)

__all__ = [
    "masked_mse_per_channel",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "sample_timesteps",
]
