"""Tensor-parallel training over a 2-D ('data', 'model') mesh via GSPMD.

The reference has no model parallelism (SURVEY.md §2.4: the vit_tiny model
is tens of MB and fits one GPU), but it ships the larger vit_small/vit_base
TransHE factories (vision_transformer.py:404-417).  For those, replicating
params + Adam state on every chip wastes HBM; this module shards the ViT —
the one component whose size scales with `cfg.vit_variant` — Megatron-style
over a 'model' mesh axis and lets XLA's SPMD partitioner insert the
collectives (the scaling-book recipe: annotate shardings, don't hand-write
collectives).

Contrast with train/step.py's shard_map DP step (explicit `lax.pmean`, the
DDP analog): here the whole step is a plain `jax.jit` over a 2-D mesh, the
batch is sharded over 'data', parameter leaves carry NamedShardings over
'model', and the data-axis gradient reduction falls out of the global-mean
loss semantics automatically.  BatchNorm statistics are likewise global
(SyncBN semantics) because the model's `axis_name=('batch',)` pmean runs
over the *global* vmapped batch axis.

Layout (first match wins; everything else replicated):
  * attn qkv kernel  (D, 3D)  -> P(None, 'model')   column-parallel
  * attn qkv bias    (3D,)    -> P('model')
  * attn proj kernel (D, D)   -> P('model', None)   row-parallel
  * mlp fc1 kernel   (D, 4D)  -> P(None, 'model')   column-parallel
  * mlp fc1 bias     (4D,)    -> P('model')
  * mlp fc2 kernel   (4D, D)  -> P('model', None)   row-parallel

The column→row pairing keeps the intra-block activations sharded over
'model' with one reduce per block half, the standard Megatron pattern; the
Adam mu/nu mirror the param shardings (shard_train_state), so optimizer
memory scales down with the 'model' axis too.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.step import TrainState, accum_value_and_grad, make_sample_loss

# (path regex, spec) — matched against '/'-joined param paths
_TP_RULES = (
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/qkv/bias$", P("model")),
    (r"attn/proj/kernel$", P("model", None)),
    (r"mlp_fc1/kernel$", P(None, "model")),
    (r"mlp_fc1/bias$", P("model")),
    (r"mlp_fc2/kernel$", P("model", None)),
)


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """('data', 'model') mesh; 'model' is the minor (fastest-varying) axis so
    the heavy TP collectives ride adjacent-chip ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < n_data * n_model:
        raise ValueError(
            f"need {n_data * n_model} devices, have {devices.size}")
    grid = devices.flatten()[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def match_tp_axes(path_str: str, leaf, n_shard: int, axis_name: str = "model",
                  dim_offset: int = 0):
    """The ONE implementation of the Megatron rule match + divisibility
    check, shared by tp_param_specs (raw params, dim_offset=0) and
    pp.shard_pp_params (stacked (S, per, ...) stage leaves, dim_offset=2) —
    a rule edit here reaches both layouts.  Returns the axes tuple for the
    param dims (with 'model' renamed to axis_name) or None."""
    for pat, sp in _TP_RULES:
        if re.search(pat, path_str):
            axes = tuple(axis_name if ax == "model" else ax for ax in sp)
            divisible = all(
                ax is None or leaf.shape[dim_offset + i] % n_shard == 0
                for i, ax in enumerate(axes)
            )
            if divisible:
                return axes
    return None


def tp_param_specs(params, mesh: Mesh):
    """PartitionSpec pytree for `params`: TP rules where the sharded dim
    divides the 'model' axis size, replicated otherwise."""
    n_model = mesh.shape["model"]

    def spec(path, leaf):
        axes = match_tp_axes(_path_str(path), leaf, n_model)
        return P(*axes) if axes is not None else P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_train_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place a TrainState on the mesh: params per tp_param_specs, optimizer
    leaves (Adam mu/nu mirror the params tree) with the matching param's
    spec, everything else replicated."""
    specs = tp_param_specs(state.params, mesh)

    def put(x, sp):
        return jax.device_put(x, NamedSharding(mesh, sp))

    params = jax.tree.map(put, state.params, specs)

    # param-path -> spec; optimizer leaves are matched by path SUFFIX
    # (mu/nu paths are '<state idx>/mu/<param path...>')
    by_path = {
        _path_str(p): s
        for p, s in jax.tree_util.tree_leaves_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
    }

    def put_opt(path, x):
        s = _path_str(path)
        for k, sp in by_path.items():
            # '/'-boundary suffix match: a bare endswith would let
            # 'cross_attn/qkv/kernel' steal 'attn/qkv/kernel''s spec
            if s == k or s.endswith("/" + k):
                return put(x, sp)
        return put(x, P())

    opt_state = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    return TrainState(
        step=put(state.step, P()), params=params, opt_state=opt_state
    )


def make_tp_train_step(
    pipe,
    tx,
    mesh: Mesh,
    lpips_fn: Optional[Callable] = None,
    l2_weight: float = 1.0,
    lpips_weight: float = 0.1,
    donate: bool = True,
    patch_mode: bool = True,
    perturb: bool = True,
    accum_steps: int = 1,
):
    """GSPMD train step over a ('data', 'model') mesh.

    Same contract as train/step.py::make_train_step — (state, batch, rng) ->
    (state, stats) with `batch` carrying the global batch on its leading
    axis — but `state` should be placed with `shard_train_state` and `batch`
    with `mesh.shard_batch` (P('data') works unchanged on the 2-D mesh; the
    'model' axis replicates the batch).

    The model must be built with `axis_name=('batch',)` (or None when V==1):
    under plain jit there is no manual 'data' axis to pmean over — the
    global-batch vmap axis IS the SyncBN reduction axis.
    """
    ax = pipe.model.axis_name
    if ax not in (None, "batch", ("batch",)):
        raise ValueError(
            "the GSPMD TP step needs a model built with axis_name=('batch',);"
            f" got {ax!r} — 'data' is a shard_map-only (manual) axis"
        )
    if "data" not in mesh.shape or "model" not in mesh.shape:
        raise ValueError(f"mesh must have ('data','model') axes, got {mesh}")

    sample_loss = make_sample_loss(
        pipe, lpips_fn, l2_weight, lpips_weight, patch_mode, perturb
    )

    n_data = mesh.shape["data"]

    def step(state: TrainState, batch, rng):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if accum_steps > 1 and b % (n_data * accum_steps) != 0:
            # the strided microbatch split keeps rows shard-local only when
            # accum_steps divides the per-shard batch (b / n_data); anything
            # else would silently reshard or idle data shards per microbatch
            raise ValueError(
                f"global batch {b} must be divisible by data axis {n_data} "
                f"x accum_steps {accum_steps} so each shard's local batch "
                "splits evenly into microbatches"
            )
        # same per-sample keys as the DP step's global-index fold
        # (train/step.py local_step: axis_index('data')*local_b + arange)
        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(b))

        def loss_fn(params, mb_batch, mb_rngs):
            losses, stats = jax.vmap(
                partial(sample_loss, params), axis_name="batch"
            )(mb_batch, mb_rngs)
            return jnp.mean(losses), jax.tree.map(jnp.mean, stats)

        (_, stats), grads = accum_value_and_grad(
            loss_fn, state.params, batch, rngs, accum_steps
        )
        # pin the gradient layout to the param layout so the partitioner
        # reduce-scatters over 'model' instead of replicating the update
        grads = jax.lax.with_sharding_constraint(
            grads,
            jax.tree.map(
                lambda sp: NamedSharding(mesh, sp),
                tp_param_specs(state.params, mesh),
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, stats

    return jax.jit(step, donate_argnums=(0,) if donate else ())
