"""Training: loss, LR schedule, optimizer, the sharded train step, checkpoints."""

from .loss import TrainSample, patch_losses, unpack_patches  # noqa: F401
from .schedule import warmup_cosine_epoch_schedule  # noqa: F401
from .step import TrainState, make_optimizer, make_train_step  # noqa: F401
