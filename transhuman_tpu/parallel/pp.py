"""Pipeline-parallel TransHE over a ('pipe',) mesh (GPipe schedule).

The reference has no pipeline parallelism (SURVEY.md §2.4: vit_tiny fits
one GPU many times over), but it ships the vit_small/vit_base TransHE
factories (vision_transformer.py:404-417).  parallel/tp.py shards those
*within* each layer (Megatron); this module shards them *across* layers:
the `depth` transformer blocks are split into `n_stages` contiguous stages,
stage i's parameters live only on pipe-device i, and microbatches flow
through the ring via `lax.ppermute` inside a `shard_map` — the scaling-book
pipelining recipe (activations hop one ICI neighbour per tick, no
parameter traffic at all).

Why this shape and not a hand-written 1F1B schedule: the whole pipeline is
ONE `lax.scan` over n_micro + n_stages - 1 ticks, so `jax.grad` of the
scanned forward IS the pipelined backward — the scan's VJP runs the ticks
in reverse and the transpose of the (i -> i+1) ppermute is the (i+1 -> i)
ppermute, i.e. cotangents hop backwards through the same ring.  GPipe
schedule semantics (all-forward then all-backward per microbatch group)
with zero schedule code.  Memory note: the scan VJP SAVES each tick's
intra-block residuals (it does not rematerialize) — per-device activation
memory scales down with n_stages via residual storage, and for tighter
budgets wrap the decode in `jax.checkpoint` at the call site (the train
path's `remat` knob pattern).

Scope: this transforms the ViT token-refinement stage only — the stage
whose parameter memory scales with `cfg.vit_variant`.  It is deliberately
NOT wired into the flagship train CLI: vit_tiny is ~5 MB and the workload's
profitable axes are DP/SP/TP (train/step.py, parallel/infer.py,
parallel/tp.py); this module is the framework capability for
vit_base-scale TransHE variants.  `__graft_entry__.dryrun_multichip` proves
forward+backward equality vs the unsharded module on the driver's mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.embedder import embed_vit_pos
from ..models.vit import Block, TransHE


def make_pp_mesh(n_pipe: int, devices=None) -> Mesh:
    """1-D ('pipe',) mesh: consecutive devices = consecutive stages, so each
    activation hop (i -> i+1) is one ICI neighbour."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_pipe:
        raise ValueError(f"need {n_pipe} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_pipe]), ("pipe",))


def stack_block_params(vit_params, n_stages: int):
    """Restack a TransHE param tree {mask_token, block_0..block_{d-1}, norm}
    into the pipeline layout:

      {'stages': tree with leading (n_stages, depth//n_stages, ...),
       'mask_token': ..., 'norm': ...}

    'stages' leaves are the per-block leaves stacked over depth then folded
    to (stage, block-within-stage); shard them with `shard_pp_params`.
    """
    depth = sum(1 for k in vit_params if k.startswith("block_"))
    if depth == 0 or depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by n_stages {n_stages}")
    per = depth // n_stages
    blocks = [vit_params[f"block_{i}"] for i in range(depth)]

    def stk(*leaves):
        a = jnp.stack(leaves)
        return a.reshape((n_stages, per) + a.shape[1:])

    return {
        "stages": jax.tree.map(stk, *blocks),
        "mask_token": vit_params["mask_token"],
        "norm": vit_params["norm"],
    }


def unstack_block_params(pp_params):
    """Inverse of stack_block_params (checkpoint export / grad comparison)."""
    stages = pp_params["stages"]
    lead = jax.tree_util.tree_leaves(stages)[0].shape
    depth = lead[0] * lead[1]
    flat = jax.tree.map(lambda a: a.reshape((depth,) + a.shape[2:]), stages)
    out = {f"block_{i}": jax.tree.map(lambda a: a[i], flat) for i in range(depth)}
    out["mask_token"] = pp_params["mask_token"]
    out["norm"] = pp_params["norm"]
    return out


def shard_pp_params(mesh: Mesh, pp_params, tp_axis: str | None = None):
    """Place stage params over 'pipe' (each device holds ONLY its stage's
    blocks), mask_token/norm replicated.

    tp_axis: additionally shard each stacked block leaf Megatron-style over
    that mesh axis (the (S, per, ...) stacked leaves reuse parallel/tp.py's
    _TP_RULES on the trailing param dims) — the PP x TP layout for
    `make_pp_vit_apply(..., tp_axis=...)`.  Non-divisible dims stay
    replicated over tp_axis, exactly like tp_param_specs."""
    rep = NamedSharding(mesh, P())

    if tp_axis is None:
        def stage_spec(path, leaf):
            return P("pipe")
    else:
        from .tp import _path_str, match_tp_axes

        n_tp = mesh.shape[tp_axis]

        def stage_spec(path, leaf):
            # shared rule match (tp.py), param dims shifted past the
            # (stage, block) stacking dims
            axes = match_tp_axes(_path_str(path), leaf, n_tp,
                                 axis_name=tp_axis, dim_offset=2)
            if axes is not None:
                return P("pipe", None, *axes)
            return P("pipe")

    def put_stage(path, x):
        return jax.device_put(x, NamedSharding(mesh, stage_spec(path, x)))

    return {
        "stages": jax.tree_util.tree_map_with_path(
            put_stage, pp_params["stages"]
        ),
        "mask_token": jax.device_put(pp_params["mask_token"], rep),
        "norm": jax.tree.map(lambda x: jax.device_put(x, rep), pp_params["norm"]),
    }


def make_pp_vit_apply(
    model: TransHE,
    mesh: Mesh,
    n_micro: int,
    batch_axis: str | None = None,
    tp_axis: str | None = None,
):
    """Returns apply(pp_params, tokens, pe, mask=None) — output-equal to
    `model.apply({'params': vit_params}, tokens, pe, mask)` with the blocks
    pipelined over mesh axis 'pipe' and the token batch split into
    `n_micro` microbatches.

    tokens: (B, C, D) with B % n_micro == 0 (B is the ViT batch axis — the
    view axis V in the TransHuman forward, or B*V in a batched step).
    pe: (B, C, 3) centroids or a precomputed (B, C, D) table, exactly like
    TransHE.__call__ (models/vit.py:103-121).

    batch_axis: name of a second mesh axis to shard each microbatch's row
    axis over (DP x PP over a ('data', 'pipe') mesh: every 'data' row runs
    the same pipeline on its batch slice; stage params are replicated over
    'data' and sharded over 'pipe').  The prologue/epilogue then also run
    'data'-sharded.  None = 'pipe' is the only mesh axis used.

    tp_axis: name of a mesh axis to run Megatron tensor parallelism over
    WITHIN each pipeline stage (PP x TP over a ('pipe', 'model') mesh).
    Composition mechanics: the shard_map goes partial-manual —
    `axis_names` marks only 'pipe' (+ batch_axis) manual, the tp axis stays
    auto, so XLA's SPMD partitioner inserts the per-block-half reduces from
    the stage params' shardings (place them with
    `shard_pp_params(mesh, pp, tp_axis=...)`), exactly like parallel/tp.py
    does for the unpipelined step.  The scaling-book composition: schedule
    by hand (ppermute ring), shard by annotation.
    """
    n_stages = mesh.shape["pipe"]
    if batch_axis is not None and batch_axis not in mesh.shape:
        raise ValueError(f"batch_axis {batch_axis!r} not in mesh {mesh}")
    if tp_axis is not None:
        if tp_axis not in mesh.shape:
            raise ValueError(f"tp_axis {tp_axis!r} not in mesh {mesh}")
        if tp_axis in ("pipe", batch_axis):
            raise ValueError(f"tp_axis {tp_axis!r} must be a distinct axis")
    if model.depth % n_stages:
        raise ValueError(
            f"depth {model.depth} not divisible by pipe axis {n_stages}"
        )
    block = Block(
        model.embed_dim, model.num_heads, model.mlp_ratio, dtype=model.dtype
    )
    norm = nn.LayerNorm(epsilon=1e-6, dtype=model.dtype)
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_fn(stage_blocks, x):
        # apply this stage's depth//n_stages blocks in order
        def body(xx, p):
            return block.apply({"params": p}, xx), None

        return lax.scan(body, x, stage_blocks)[0]

    xm_spec = P(None, batch_axis)  # microbatch axis whole, rows DP-sharded

    sm_kwargs = {}
    if tp_axis is not None:
        # partial-manual: 'pipe' (+ batch_axis) are manual collectives
        # axes; tp_axis stays auto so GSPMD partitions the block matmuls
        manual = {"pipe"} | ({batch_axis} if batch_axis else set())
        sm_kwargs["axis_names"] = frozenset(manual)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("pipe"), xm_spec),
        out_specs=xm_spec,
        check_vma=False,
        **sm_kwargs,
    )
    def pipeline(stages, xm):
        # local shard: (1, per_stage, ...) -> this device's (per_stage, ...)
        mine = jax.tree.map(lambda a: a[0], stages)
        stage = lax.axis_index("pipe")
        state = jnp.zeros(xm.shape[1:], xm.dtype)
        outbuf = jnp.zeros_like(xm)

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 ingests microbatch t (clamped: ticks past n_micro feed
            # a garbage repeat whose output can never reach outbuf in time)
            inp = lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, n_micro - 1), 0, keepdims=False
            )
            cur = jnp.where(stage == 0, inp, state)
            y = stage_fn(mine, cur)
            # the last stage finishes microbatch t-(n_stages-1) at tick t
            oi = t - (n_stages - 1)
            c = jnp.clip(oi, 0, n_micro - 1)
            write = (stage == n_stages - 1) & (oi >= 0)
            prev = lax.dynamic_index_in_dim(outbuf, c, 0, keepdims=False)
            outbuf = lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, prev), c, 0
            )
            state = lax.ppermute(y, "pipe", ring)
            return (state, outbuf), None

        (_, outbuf), _ = lax.scan(
            tick, (state, outbuf), jnp.arange(n_micro + n_stages - 1)
        )
        # only the last stage holds real outputs; psum replicates them
        outbuf = jnp.where(stage == n_stages - 1, outbuf, 0)
        return lax.psum(outbuf, "pipe")

    def apply(pp_params, tokens, pe, mask=None):
        b = tokens.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
        lead = jax.tree_util.tree_leaves(pp_params["stages"])[0].shape[0]
        if lead != n_stages:
            # a mismatched-but-divisible stacking would otherwise shard
            # cleanly and the stages[0] pick would silently DROP blocks
            raise ValueError(
                f"params stacked for {lead} stages but mesh 'pipe' axis is "
                f"{n_stages}; restack with stack_block_params(p, {n_stages})"
            )
        # prologue/epilogue replicated, exactly TransHE.__call__'s
        if mask is not None:
            tokens = jnp.where(
                mask[..., None],
                pp_params["mask_token"].astype(tokens.dtype),
                tokens,
            )
        if pe.shape[-1] != model.embed_dim:
            pe = embed_vit_pos(pe, model.embed_dim)
        x = tokens + pe.astype(tokens.dtype)
        xm = x.reshape((n_micro, b // n_micro) + x.shape[1:])
        y = pipeline(pp_params["stages"], xm)
        y = y.reshape(x.shape)
        return norm.apply({"params": pp_params["norm"]}, y)

    return apply
