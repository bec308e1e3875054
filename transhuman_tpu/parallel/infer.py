"""Ray-sharded full-frame inference over a device mesh.

The rays of a frame are embarrassingly parallel after the per-frame
prologue (SURVEY.md §5.7 — this is the workload's natural "sequence
parallelism"): shard the ray axis over the mesh, replicate params + frame,
let every chip run its share of chunks; no collectives on the hot path (the
prologue is recomputed per chip — ~2% of frame time — rather than
broadcast, keeping the step collective-free).
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_render(pipe, mesh: Mesh, dense: bool = False):
    """Returns (render_fn, pad_multiple).

    render_fn(params, frame, rays) -> maps dict; the RayBundle must be
    padded to a multiple of `pad_multiple` rays (pipeline.pad_rays).
    dense=True forces the compaction-off path (the CLI's overflow
    auto-recovery fallback).
    """
    n_dev = mesh.devices.size
    pad_multiple = n_dev * pipe.chunk_rays
    method = pipe.render_frame_dense if dense else pipe.render_frame

    def local(params, frame, rays):
        return method(params, frame, rays)

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )

    def render(params, frame, rays):
        # pytree-level device_put: one batched transfer per tree, not one
        # dispatch per leaf (this runs per FRAME on the eval path)
        rays = jax.device_put(rays, NamedSharding(mesh, P("data")))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        frame = jax.device_put(frame, rep)
        return fn(params, frame, rays)

    return render, pad_multiple
