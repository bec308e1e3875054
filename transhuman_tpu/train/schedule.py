"""Learning-rate schedule: linear warmup into cosine annealing, stepped per
*epoch* (the reference steps its scheduler once per epoch,
train_net.py:72; warmup wrapper `lib/utils/optimizer/lr_scheduler.py:142-222`,
cosine `lib/train/scheduler.py:21-28`)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_epoch_schedule(
    base_lr: float = 7e-4,
    end_lr: float = 1e-6,
    warmup_epochs: int = 300,
    decay_epochs: int = 3000,
    iters_per_epoch: int = 500,
):
    """Returns lr(step). epoch = step // iters_per_epoch; linear 0->base over
    `warmup_epochs`, then cosine base->end over the remaining
    `decay_epochs - warmup_epochs`."""

    t_max = max(decay_epochs - warmup_epochs, 1)

    def schedule(step):
        epoch = jnp.asarray(step) // iters_per_epoch
        warm = base_lr * jnp.minimum((epoch + 1) / max(warmup_epochs, 1), 1.0)
        t = jnp.clip(epoch - warmup_epochs, 0, t_max)
        cos = end_lr + 0.5 * (base_lr - end_lr) * (1 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
