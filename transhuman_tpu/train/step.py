"""The sharded training step: forward render -> patch loss -> psum'd grads.

This is the TPU-native replacement for the reference's trainer stack
(`lib/train/trainers/trainer.py:61-124` + DDP/SyncBN wrap at :23-33):
* one jitted `shard_map` step over a ('data',) mesh — the batch is sharded,
  parameters replicated, gradients averaged with `lax.pmean` over ICI
  (= DDP's bucket allreduce),
* BatchNorm statistics sync across the mesh exactly like SyncBatchNorm when
  the model is built with `axis_name=("batch", "data")`,
* per-element gradient value clipping at 40 (trainer.py:85),
* Adam with the per-epoch warmup-cosine schedule (optimizer.py/scheduler.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .loss import TrainSample, patch_losses, random_ray_losses
from .schedule import warmup_cosine_epoch_schedule


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(
    lr: float = 7e-4,
    end_lr: float = 1e-6,
    warmup_epochs: int = 300,
    decay_epochs: int = 3000,
    iters_per_epoch: int = 500,
    clip_value: float = 40.0,
    weight_decay: float = 0.0,
    optim: str = "adam",
):
    """Adam/AdamW + per-element value clip + warmup-cosine(epoch) schedule."""
    schedule = warmup_cosine_epoch_schedule(
        lr, end_lr, warmup_epochs, decay_epochs, iters_per_epoch
    )
    if optim == "adamw" or (optim == "adam" and weight_decay > 0):
        core = optax.adamw(schedule, weight_decay=weight_decay)
    elif optim == "adam":
        core = optax.adam(schedule)
    elif optim == "radam":
        # reference factory option (lib/train/optimizer.py:4-9, vendored
        # lib/utils/optimizer/radam.py); unused by shipped configs
        core = optax.radam(schedule)
    elif optim == "sgd":
        core = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    return optax.chain(optax.clip(clip_value), core), schedule


def init_state(params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_sample_loss(
    pipe,
    lpips_fn: Optional[Callable] = None,
    l2_weight: float = 1.0,
    lpips_weight: float = 0.1,
    patch_mode: bool = True,
    perturb: bool = True,
):
    """(params, TrainSample, rng) -> (loss, stats) for ONE sample — the loss
    composition of the reference's NetworkWrapper (if_nerf_clight.py:43-91),
    shared by the shard_map DP step here and the GSPMD TP step
    (parallel/tp.py)."""

    def sample_loss(params, sample: TrainSample, rng):
        out = pipe.render_train(
            params, sample.frame, sample.rays, rng, sample_jitter=perturb
        )
        if not patch_mode:
            # the reference's non-patch branch adds img_loss UNWEIGHTED
            # (if_nerf_clight.py:77-81; l2rec_weight only scales the patch MSE)
            return random_ray_losses(out["rgb_map"], sample)
        return patch_losses(
            out["rgb_map"], sample, lpips_fn, l2_weight, lpips_weight
        )

    return sample_loss


def make_train_step(
    pipe,
    tx,
    mesh: Optional[Mesh] = None,
    lpips_fn: Optional[Callable] = None,
    l2_weight: float = 1.0,
    lpips_weight: float = 0.1,
    donate: bool = True,
    patch_mode: bool = True,
    perturb: bool = True,
):
    """Build the jitted train step.

    Signature of the returned fn: (state, batch, rng) -> (state, stats)
    where `batch` is a TrainSample pytree with a leading global-batch axis
    (divisible by the mesh 'data' size) and rng is a scalar PRNG key.
    `patch_mode=False` selects the non-patch masked-MSE loss
    (cfg.patch.use_patch_sampling=False; if_nerf_clight.py:77-81).
    `perturb=False` disables the stratified-sampling jitter, the reference's
    `cfg.perturb > 0 and self.net.training` gate (if_clight_renderer.py:276).
    """

    sample_loss = make_sample_loss(
        pipe, lpips_fn, l2_weight, lpips_weight, patch_mode, perturb
    )

    def local_step(state: TrainState, batch: TrainSample, rng):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        # fold by *global* sample index: results are bitwise-independent of
        # how the batch is laid out across the mesh (determinism contract)
        gidx = jax.lax.axis_index("data") * b + jnp.arange(b)
        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(gidx)

        def loss_fn(params):
            losses, stats = jax.vmap(
                partial(sample_loss, params), axis_name="batch"
            )(batch, rngs)
            return jnp.mean(losses), jax.tree.map(jnp.mean, stats)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "data")
        stats = jax.lax.pmean(stats, "data")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, stats

    if mesh is None:
        # single-device path: fake the 'data' axis with a size-1 shard_map
        mesh = Mesh(jax.devices()[:1], ("data",))

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


from ..registry import TRAINERS


@TRAINERS.register("clight")
def _make_clight_trainer(*args, **kw):
    """cfg.trainer plugin entry (reference make_trainer.py:4-14): the loss
    wrapper + jitted DP train step."""
    return make_train_step(*args, **kw)
