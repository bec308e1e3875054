"""Inference entry point (reference parity: run.py --type {evaluate,
visualize, reconstruction}).

All three workloads share the checkpointed model + jitted render pipelines;
ray counts are bucketed to multiples of cfg.pad_bucket so the whole eval
reuses a handful of compiled programs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Loader
from ..evals.evaluator import Evaluator  # noqa: F401  registers 'if_nerf'
from ..mesh_ops.ply import save_ply
from ..mesh_ops.reconstruct import extract_mesh
from ..render.pipeline import pad_rays
from ..train.checkpoint import load_params
from ..viz.perform import PerformVisualizer  # noqa: F401  registers 'perform'
from ..viz.video import frames_to_video
from .common import build_runtime, make_dataset, model_dir, parse_args, result_dir


def _make_render(cfg, pipe, dense=False):
    """(render_fn, ray bucket).  cfg.mesh_axis_rays > 1 shards the ray axis
    over that many devices (parallel/infer.py); otherwise single-device jit.
    dense=True forces the compaction-off path (overflow fallback)."""
    if cfg.mesh_axis_rays > 1:
        from jax.sharding import Mesh

        from ..parallel.infer import make_sharded_render

        # LOCAL devices: under multi-process frame sharding each process
        # renders its own frames, so its ray mesh must span only devices it
        # can address (jax.devices() would hand every process the global
        # list and non-zero ranks would device_put onto remote chips)
        devs = jax.local_devices()
        if len(devs) < cfg.mesh_axis_rays:
            raise ValueError(
                f"mesh_axis_rays={cfg.mesh_axis_rays} but only "
                f"{len(devs)} local devices are available"
            )
        render, pad_mult = make_sharded_render(
            pipe, Mesh(np.array(devs[: cfg.mesh_axis_rays]), ("data",)),
            dense=dense,
        )
        bucket = -(-max(cfg.pad_bucket, pad_mult) // pad_mult) * pad_mult
        return render, bucket
    fn = pipe.render_frame_dense if dense else pipe.render_frame
    cr = pipe.chunk_rays
    # ceil to a chunk multiple: render_frame asserts r % chunk_rays == 0,
    # and pad_bucket need not divide evenly (e.g. chunk_size 20000 -> 312)
    return jax.jit(fn), -(-max(cfg.pad_bucket, cr) // cr) * cr


class FrameRenderer:
    """Jitted frame render with overflow auto-recovery: if the compact
    path's static capacity clips (overflow > 0), the frame is re-rendered
    through the dense (compaction-off) path BEFORE anything is written, so
    no code path can ship rgb holes — matching the reference's
    always-complete scatter (if_clight_renderer.py:468-482).  The dense
    fallback is jitted lazily: a healthy run never pays its compile.
    After an overflow the compact ratio is re-derived from the measured
    shortfall and the compact render rebuilt once (_retune), so the rest of
    the run goes back to the fast path instead of the ~5x-slower dense."""

    def __init__(self, cfg, pipe):
        self._cfg, self._pipe = cfg, pipe
        self._render, self.bucket = _make_render(cfg, pipe)
        self._dense = None
        self._n_frames = 0
        self.n_fallbacks = 0  # dense re-renders (observability: serve /stats)
        # getattr: tests drive FrameRenderer with minimal duck-typed cfgs
        self._profile_dir = getattr(cfg, "profile_dir", "")

    def dispatch(self, params, frame, eval_rays):
        """Async: jit dispatch only — device arrays come back unfetched."""
        # device trace of the 3rd frame (post-compile; SURVEY §5.1 plan).
        # The eval loop pipelines dispatch(i+1) before fetch(i), so the
        # ordinal rides the dispatched tuple and the trace stops at the
        # fetch of the SAME frame it started on.
        self._n_frames += 1
        if self._profile_dir and self._n_frames == 3:
            jax.profiler.start_trace(self._cfg.profile_dir)
        rays = pad_rays(eval_rays.rays, self.bucket)
        frame_d = jax.tree.map(jnp.asarray, frame)
        rays_d = jax.tree.map(jnp.asarray, rays)
        # the compact ratio THIS dispatch rendered with rides along: under
        # pipelining, a fetch-time retune can land between a frame's
        # dispatch and its fetch, and the retune math needs the real one
        return (self._render(params, frame_d, rays_d), frame_d, rays_d,
                self._n_frames, self._pipe.compact_ratio)

    def fetch(self, params, dispatched, eval_rays):
        """Force outputs to host (blocks); dense re-render on overflow."""
        out, frame_d, rays_d, ordinal, ratio_used = dispatched
        if self._profile_dir and ordinal == 3:
            # forced scalar readback, not just block_until_ready: the latter
            # does not reliably block through the axon TPU tunnel (CLAUDE.md)
            # and stop_trace would truncate the device trace
            # scalar-index on device first: np.asarray(rgb_map) would pull
            # the whole eval-resolution buffer through the ~20-25 ms/MB
            # axon tunnel when only a completion fence is needed
            float(jax.device_get(out["rgb_map"][0, 0]))
            jax.profiler.stop_trace()
            print(f"profiler trace (frame 3) written to {self._profile_dir}")
        n = eval_rays.rays.ray_o.shape[0]
        # (n_shards,) under ray sharding (one count per shard), (1,) otherwise
        over_per_shard = np.atleast_1d(np.asarray(out.pop("overflow", 0)))
        if over_per_shard.sum():
            self.n_fallbacks += 1
            print(
                f"WARNING: compaction capacity clipped "
                f"{int(over_per_shard.sum())} active points;"
                " re-rendering this frame with compaction off"
            )
            if self._dense is None:
                self._dense, _ = _make_render(self._cfg, self._pipe, dense=True)
            out = dict(self._dense(params, frame_d, rays_d))
            out.pop("overflow", None)
            self._retune(rays_d, over_per_shard, ratio_used)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def _retune(self, rays_d, over_per_shard: np.ndarray, ratio_used: float):
        """Self-tuning compaction: after an overflow, re-derive the ratio
        from the measured shortfall and rebuild the compact render once —
        one recompile instead of paying the ~5x-slower dense path on every
        remaining frame (the reference never tunes anything here because its
        shapes are dynamic, if_clight_renderer.py:440-444).  Converges: the
        ratio only grows, and at 1.0 overflow is impossible (capacity >= n).

        Capacity is PER SHARD under ray sharding (pipeline._compact_plan
        computes m from the local flat count inside shard_map), so the need
        is the max over shards — tuning to the global average would keep
        under-provisioning a shard whose rays concentrate on the body and
        re-pay the dense fallback + recompile every similar frame."""
        pipe = self._pipe
        s = pipe.n_samples
        n_shards = over_per_shard.shape[0]
        n_flat = rays_d.ray_o.shape[0] // n_shards * s  # local flat count
        cp = pipe.chunk_rays * s
        cap = -(-int(ratio_used * n_flat) // cp) * cp  # capacity AT dispatch
        worst = int(over_per_shard.max())
        new_ratio = min(1.0, 1.15 * (cap + worst) / n_flat)
        if new_ratio <= pipe.compact_ratio:
            # a frame dispatched before an earlier retune landed; the
            # current ratio already covers the measured need — no rebuild
            return
        print(
            f"auto-tuning compact_ratio {pipe.compact_ratio:.4f} -> "
            f"{new_ratio:.4f} (measured need {(cap + worst) / n_flat:.4f} "
            "+ 15% margin); recompiling the compact render once"
        )
        pipe.compact_ratio = new_ratio
        self._render, self.bucket = _make_render(self._cfg, pipe)


def _pipelined(items, dispatch):
    """Yield (item, device_out) one frame behind the dispatch: frame i+1's
    render runs on the device while the caller does host-side work
    (metrics, PNG encode) for frame i."""
    prev = None
    for item in items:
        dev = dispatch(item)
        if prev is not None:
            yield prev
        prev = (item, dev)
    if prev is not None:
        yield prev


def make_eval_lpips_fn(cfg):
    """Masked/bucketed LPIPS for the Evaluator (None when no weights): the
    Evaluator pads bbox crops to size buckets -> one compile per bucket, not
    one per frame shape."""
    if not cfg.lpips_weights:
        return None
    from ..models.lpips import load_lpips_params, make_lpips_masked_fn

    return jax.jit(
        make_lpips_masked_fn(
            load_lpips_params(cfg.lpips_weights, backbone=cfg.lpips_backbone)
        )
    )


def _frame_shard(indices):
    """This process's strided slice of the FrameSampler sequence, plus each
    frame's global ordinal.  Under `jax.distributed` the eval/visualize/mesh
    frame loops scale across processes (the frames are independent; the
    reference's eval is strictly one GPU, run.py:7-55); single-process this
    is the identity."""
    idx = np.asarray(indices)
    n_proc, proc = jax.process_count(), jax.process_index()
    if n_proc == 1:
        return idx, np.arange(idx.size)
    return idx[proc::n_proc], np.arange(proc, idx.size, n_proc)


def evaluate_frames(cfg, pipe, params, dataset, ev, per_frame=None, tag=""):
    """Shared pipelined evaluation loop (run_evaluate AND the train CLI's
    --test validation pass): render every FrameSampler frame with overflow
    auto-recovery, feed the evaluator, print one line per frame.

    Multi-process (`jax.distributed`): frames are sharded across processes,
    per-frame metrics gathered back in global order, and the summary files
    written by process 0 only — the returned summary is identical to a
    single-process run on every process.

    per_frame(item, out) -> extra stats dict, accumulated into a mean.
    Returns (evaluator summary, mean extra stats)."""
    renderer = FrameRenderer(cfg, pipe)
    local_idx, positions = _frame_shard(dataset.frame_sampler_indices())
    items = Loader(
        lambda i: dataset.get_eval_item(int(i)),
        local_idx,
        prefetch=2,
    )  # overlap host decode/undistort with the device render
    extra_vals, n_frames = {}, 0
    for item, out_dev in _pipelined(
        items,
        lambda it: renderer.dispatch(params, it.frame, it.eval_rays),
    ):  # metrics for frame i run while frame i+1 renders
        out = renderer.fetch(params, out_dev, item.eval_rays)
        hw = item.target_img.shape[:2]
        r = ev.evaluate_frame(
            out["rgb_map"], item.eval_rays.rgb, item.eval_rays.mask_at_box, hw,
            human=item.human, frame_index=item.frame_index,
            cam_ind=item.cam_ind, input_imgs=np.asarray(item.frame.images),
            white_bkgd=cfg.white_bkgd,
        )
        extra = per_frame(item, out) if per_frame else {}
        for k, v in extra.items():
            extra_vals.setdefault(k, []).append(float(v))
        n_frames += 1
        print(f"[{tag}{item.human} f{item.frame_index} c{item.cam_ind}] "
              + "  ".join(f"{k}: {v:.4f}" for k, v in extra.items())
              + ("  " if extra else "")
              + "  ".join(f"{k}: {v:.4f}" for k, v in r.items() if v is not None))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mh

        from ..evals.evaluator import merge_across_processes
        from ..parallel.mesh import gather_positioned

        merge_across_processes(ev, positions[:n_frames])
        # extra keys exist only on processes that evaluated >=1 frame, but
        # the per-key gathers are collectives that every process must join
        # (skipping them left per-process-local means when any rank had 0
        # frames).  Agree on the key UNION first via a fixed-width allgather
        # so all ranks issue the same collective sequence.
        joined = ",".join(sorted(extra_vals)).encode()
        if len(joined) > 4096:
            # silent truncation would drop metrics / inject partial keys
            raise ValueError(
                f"extra-stat key list too long to gather ({len(joined)} B)"
            )
        blob = joined.ljust(4096, b"\0")
        all_blobs = np.asarray(
            mh.process_allgather(np.frombuffer(blob, np.uint8))
        ).reshape(-1, 4096)
        union = sorted({
            name
            for row in all_blobs
            for name in bytes(row).rstrip(b"\0").decode().split(",")
            if name
        })
        extra_vals = {
            k: gather_positioned(
                extra_vals.get(k, []), positions[: len(extra_vals.get(k, []))]
            )
            for k in union
        }
    summary = ev.summarize(write=jax.process_index() == 0)
    return summary, {k: float(np.mean(v)) for k, v in extra_vals.items()}


def run_evaluate(cfg, pipe, model, smpl, dataset=None, ckpt=None):
    dataset = dataset or make_dataset(cfg, "test", smpl=smpl)
    # reuse main()'s already-unpickled checkpoint when given (a vit_base-
    # scale pickle is hundreds of MB; load_params re-reads the file)
    if ckpt is not None:
        params, epoch = ckpt["params"], ckpt["epoch"]
    else:
        params, epoch = load_params(model_dir(cfg), cfg.test.epoch)
    from ..registry import EVALUATORS

    ev = EVALUATORS.get(cfg.evaluator)(
        result_dir(cfg), lpips_fn=make_eval_lpips_fn(cfg),
        exp_name=cfg.exp_name, epoch=epoch,
    )
    summary, _ = evaluate_frames(cfg, pipe, params, dataset, ev)
    print(summary)
    return summary


def run_visualize(cfg, pipe, model, smpl, dataset=None, ckpt=None):
    dataset = dataset or make_dataset(cfg, "test", smpl=smpl)
    params = ckpt["params"] if ckpt is not None else load_params(
        model_dir(cfg), cfg.test.epoch)[0]
    out_dir = os.path.join(result_dir(cfg), "perform")
    from ..registry import VISUALIZERS

    vis = VISUALIZERS.get(cfg.visualizer)(out_dir, white_bkgd=cfg.white_bkgd)
    renderer = FrameRenderer(cfg, pipe)

    humans = set()
    local_idx, _ = _frame_shard(dataset.frame_sampler_indices(full_eval=True))
    items = Loader(
        lambda i: dataset.get_perform_item(int(i), render_views=cfg.render_views),
        local_idx,
        prefetch=2,
    )
    for item, out_dev in _pipelined(
        items,
        lambda it: renderer.dispatch(params, it.frame, it.eval_rays),
    ):  # PNG encode for frame i runs while frame i+1 renders
        out = renderer.fetch(params, out_dev, item.eval_rays)
        hw = item.target_img.shape[:2]
        p = vis.visualize(out["rgb_map"], item.eval_rays.mask_at_box, hw,
                          item.frame_index, human=item.human)
        humans.add(item.human)
        print("wrote", p)
    if jax.process_count() > 1:
        # frame-sharded: wait for every process's PNGs, then assemble each
        # human's video once on process 0 (assumes the shared result dir of
        # a single-host multi-process or GCS-backed pod launch)
        from jax.experimental import multihost_utils as mh

        mh.sync_global_devices("visualize_frames_done")
        if jax.process_index() != 0:
            return
        humans = {
            h for h in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, h))
        }
    for h in humans:
        v = frames_to_video(os.path.join(out_dir, h),
                            os.path.join(out_dir, f"{h}.mp4"))
        print("video:", v)


def run_reconstruction(cfg, pipe, model, smpl, dataset=None, ckpt=None):
    dataset = dataset or make_dataset(cfg, "test", smpl=smpl)
    params = ckpt["params"] if ckpt is not None else load_params(
        model_dir(cfg), cfg.test.epoch)[0]
    out_dir = os.path.join(result_dir(cfg), "mesh")
    os.makedirs(out_dir, exist_ok=True)
    local_idx, _ = _frame_shard(dataset.frame_sampler_indices())
    for i in local_idx:
        frame, can_bounds, meta = dataset.get_mesh_item(int(i))
        verts, tris, _ = extract_mesh(
            pipe, params, frame, can_bounds,
            voxel_size=cfg.voxel_size, mesh_th=cfg.mesh_th,
        )
        path = os.path.join(
            out_dir, f"{meta['human']}_frame{meta['frame_index']:04d}.ply"
        )
        save_ply(path, verts, tris)
        print(f"wrote {path} ({len(verts)} verts, {len(tris)} tris)")


def main(argv=None, dataset=None, smpl=None):
    from .common import maybe_init_distributed

    maybe_init_distributed()  # frame-sharded eval across processes
    args, cfg = parse_args(argv, need_type=True)
    cfg = cfg.merge_dict({"run_mode": "test", "perturb": 0.0})
    if args.type == "light_stage":
        # reference run.py:160-162: ply -> occupancy volume conversion
        from ..tools.voxelize_mesh import main as vox_main

        vox_argv = [args.ply, args.occupancy_out or args.ply + ".occupancy.npy",
                    "--voxel", str(cfg.voxel_size[0])]
        return vox_main(vox_argv)
    from ..train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(model_dir(cfg), cfg.test.epoch)
    pe_table = ckpt.get("pe_table") if ckpt else None
    model, pipe, smpl, _ = build_runtime(cfg, smpl=smpl, pe_table=pe_table)
    if args.type == "evaluate":
        return run_evaluate(cfg, pipe, model, smpl, dataset, ckpt=ckpt)
    if args.type == "visualize":
        return run_visualize(cfg, pipe, model, smpl, dataset, ckpt=ckpt)
    return run_reconstruction(cfg, pipe, model, smpl, dataset, ckpt=ckpt)


if __name__ == "__main__":
    main()
