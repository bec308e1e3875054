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
            loss, stats = random_ray_losses(out["rgb_map"], sample)
        else:
            loss, stats = patch_losses(
                out["rgb_map"], sample, lpips_fn, l2_weight, lpips_weight
            )
        if "overflow" in out:
            # train.cull capacity clips (batch-meaned like every stat; any
            # value > 0 means some points lost contribution AND gradient —
            # the trainer warns and the fix is raising train.cull_ratio)
            stats["overflow"] = out["overflow"][0].astype(jnp.float32)
        return loss, stats

    return sample_loss


def accum_value_and_grad(loss_fn, params, batch, rngs, accum_steps: int):
    """value_and_grad of the batch-mean loss, evaluated in `accum_steps`
    sequential microbatches with summed-then-averaged gradients (gradient
    accumulation: peak activation memory scales with the microbatch).

    `loss_fn(params, batch, rngs) -> (loss, stats)` must be a per-batch MEAN
    (equal-size microbatches make the mean-of-means exact).  The caller
    derives `rngs` over the FULL batch, so per-sample keys are identical for
    every accum_steps — accumulation never changes which stochastic render a
    sample gets.

    Semantics note: this equals accum_steps-way data parallelism WITHOUT
    cross-microbatch BatchNorm pooling — each microbatch normalizes by its
    own batch statistics (the model's `axis_name='batch'` pmean sees only the
    microbatch), so with accum_steps > 1 the result differs from the
    one-shot batch exactly as unsynced-BN DDP differs from SyncBN.  Gradients
    and stats are arithmetic means over microbatches either way.

    Corollary: microbatch MEMBERSHIP depends on a sample's position in the
    batch, so with cross-sample BN pooling the bitwise
    layout-independence contract of the DP step (see local_step's rng fold)
    holds only at accum_steps == 1 — reordering samples across devices
    changes which samples share BN statistics, not which rng they get.
    """
    vag = jax.value_and_grad(loss_fn, has_aux=True)
    if accum_steps <= 1:
        return vag(params, batch, rngs)
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b % accum_steps != 0:
        raise ValueError(
            f"batch {b} not divisible by accum_steps {accum_steps}"
        )
    mb = b // accum_steps

    def split(x):
        # STRIDED split: microbatch j = samples {j, j+accum, j+2*accum, ...}.
        # Grouping is arbitrary for the shard_map DP step (the batch here is
        # device-local), but under the GSPMD TP step the batch axis is
        # sharded over 'data' in contiguous blocks — a strided split keeps
        # every microbatch's rows on their owning devices (each shard
        # contributes local_b/accum rows per microbatch) instead of parking
        # whole shards idle the way a contiguous split would.
        return jnp.swapaxes(
            x.reshape((mb, accum_steps) + x.shape[1:]), 0, 1
        )

    batch_s = jax.tree.map(split, batch)
    rngs_s = split(rngs)

    # one lowered copy of the loss+grad program: zero-init the carry from
    # abstract shapes instead of tracing the first microbatch separately
    carry0 = jax.tree.map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype),
        jax.eval_shape(
            vag, params,
            jax.tree.map(lambda x: x[0], batch_s),
            rngs_s[0],
        ),
    )

    def body(carry, xs):
        mb_batch, mb_rngs = xs
        out = vag(params, mb_batch, mb_rngs)
        return jax.tree.map(jnp.add, carry, out), None

    total, _ = jax.lax.scan(body, carry0, (batch_s, rngs_s))
    return jax.tree.map(lambda x: x / accum_steps, total)


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
    accum_steps: int = 1,
):
    """Build the jitted train step.

    Signature of the returned fn: (state, batch, rng) -> (state, stats)
    where `batch` is a TrainSample pytree with a leading global-batch axis
    (divisible by the mesh 'data' size) and rng is a scalar PRNG key.
    `patch_mode=False` selects the non-patch masked-MSE loss
    (cfg.patch.use_patch_sampling=False; if_nerf_clight.py:77-81).
    `perturb=False` disables the stratified-sampling jitter, the reference's
    `cfg.perturb > 0 and self.net.training` gate (if_clight_renderer.py:276).
    `accum_steps > 1` splits each device's local batch into that many
    sequential microbatches with averaged gradients (one optimizer update
    per call; see accum_value_and_grad for the BN-statistics caveat).
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

        def loss_fn(params, mb_batch, mb_rngs):
            losses, stats = jax.vmap(
                partial(sample_loss, params), axis_name="batch"
            )(mb_batch, mb_rngs)
            return jnp.mean(losses), jax.tree.map(jnp.mean, stats)

        (loss, stats), grads = accum_value_and_grad(
            loss_fn, state.params, batch, rngs, accum_steps
        )
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
