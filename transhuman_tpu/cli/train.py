"""Training entry point (reference parity: train_net.py).

    python -m transhuman_tpu.cli.train --cfg_file configs/train_or_eval.yaml [k v ...]

Differences from the reference runtime model (SURVEY.md §2.4): one process
drives all local chips through a ('data',) mesh (multi-host via
`jax.distributed.initialize` + per-process index sharding) instead of
torch.distributed.launch; gradients allreduce via lax.pmean inside the
jitted step; SyncBN via the model's axis_name.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Loader
from ..models.lpips import load_lpips_params, make_lpips_fn
from ..parallel import make_mesh, shard_batch
from ..train import make_optimizer, make_train_step  # noqa: F401  registers 'clight' trainer
from ..train.checkpoint import AsyncCheckpointer, load_checkpoint
from ..train.step import init_state
from ..utils.recorder import Recorder
from .common import build_runtime, make_dataset, model_dir, parse_args, seed_everything


def stack_samples(samples):
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *samples)


from .common import maybe_init_distributed as _maybe_init_distributed  # noqa: E402


def validate(cfg, dataset=None, smpl=None):
    """`--test` validation pass (train_net.py:90-98 + trainer.val,
    trainer.py:127-155): weights-only checkpoint load, render every val
    frame, average per-frame loss stats, run the standard evaluator, and
    write one unconditional 'val' record.

    Loss-branch note: the reference's val loss goes through NetworkWrapper,
    whose patch branch indexes `batch['patch_masks']` — a key test batches
    never carry (can_smpl.py:507) — so under the shipped config
    (patch.use_patch_sampling True) trainer.val would KeyError; the only
    branch that can run on val data is the non-patch masked MSE
    (if_nerf_clight.py:77-81), which is what this computes (`img_loss`).
    """
    from .common import result_dir
    from .run import evaluate_frames, make_eval_lpips_fn

    cfg = cfg.merge_dict({"run_mode": "test", "perturb": 0.0})
    ckpt = load_checkpoint(model_dir(cfg), cfg.test.epoch)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {model_dir(cfg)}")
    pe_table = ckpt.get("pe_table")
    model, pipe, smpl, _ = build_runtime(cfg, smpl=smpl, pe_table=pe_table)
    dataset = dataset or make_dataset(cfg, "test", smpl=smpl)
    # reuse the already-unpickled checkpoint (a vit_base-scale pickle is
    # hundreds of MB; load_params would read + unpickle it a second time)
    params, epoch = ckpt["params"], ckpt["epoch"]

    from ..evals.evaluator import Evaluator  # noqa: F401  registers 'if_nerf'

    epoch = int(epoch)  # ckpt pytrees store it as a 0-d array
    from ..registry import EVALUATORS

    ev = EVALUATORS.get(cfg.evaluator)(
        result_dir(cfg), lpips_fn=make_eval_lpips_fn(cfg),
        exp_name=cfg.exp_name, epoch=epoch,
    )
    recorder = Recorder(cfg.record_dir, cfg.record_interval, cfg.log_interval,
                        enabled=jax.process_index() == 0 and cfg.use_record)
    recorder.epoch = epoch

    def val_loss(item, out):
        # img2mse over the in-box rays (if_nerf_clight.py:77-81)
        err = out["rgb_map"] - item.eval_rays.rgb
        img_loss = float(np.mean(err * err))
        return {"img_loss": img_loss, "loss": img_loss}

    summary, val_stats = evaluate_frames(
        cfg, pipe, params, dataset, ev, per_frame=val_loss, tag="val "
    )
    print("  ".join(f"{k}: {v:.4f}" for k, v in val_stats.items()))
    print(summary)
    recorder.record("val", extra={**val_stats, **{
        k: v for k, v in summary.items()
        if k not in ("experiment", "epoch") and isinstance(v, (int, float))
    }}, force=True)
    recorder.close()
    return val_stats, summary


def main(argv=None, dataset=None, smpl=None):
    _maybe_init_distributed()
    args, cfg = parse_args(argv, allow_test=True)
    if args.test:
        return validate(cfg, dataset=dataset, smpl=smpl)
    seed_everything(cfg.seed)

    tp = cfg.mesh_axis_model > 1
    if tp:
        # tensor-parallel: 2-D ('data','model') mesh, GSPMD step — the
        # SyncBN reduction is the global vmapped batch axis (parallel/tp.py)
        from ..parallel.tp import make_tp_mesh

        n_data = cfg.mesh_axis_data or (
            jax.device_count() // cfg.mesh_axis_model
        )
        mesh = make_tp_mesh(n_data, cfg.mesh_axis_model)
        sync_bn = ("batch",)
    else:
        mesh = make_mesh(cfg.mesh_axis_data or None)  # 0 = all devices
        sync_bn = ("batch", "data")
    n_dev = mesh.shape["data"]  # batch scales with the data axis only

    # Load any resume checkpoint BEFORE building the runtime: a converted
    # official checkpoint carries the reference-op-exact PE table
    # (tools/convert_checkpoint.py --pe_table), and fine-tuning must run —
    # and re-save — that table, not the decorrelated recomputed encoding
    # (CLAUDE.md parity trap; the reference stores the PE as a buffer in its
    # state_dict, so its fine-tunes keep it implicitly).
    mdir = model_dir(cfg)
    ckpt = load_checkpoint(mdir) if cfg.resume else None
    if cfg.specified_resume:
        ckpt = load_checkpoint(mdir, explicit_path=cfg.specified_resume)
        if ckpt is None:
            # silent fall-through would train from scratch and then
            # OVERWRITE the existing checkpoints with random-init weights
            raise FileNotFoundError(
                f"specified_resume={cfg.specified_resume!r} does not exist"
            )
    pe_table = ckpt.get("pe_table") if ckpt else None
    model, pipe, smpl, cluster = build_runtime(
        cfg, axis_name=sync_bn, smpl=smpl, pe_table=pe_table
    )

    lpips_fn = None
    if cfg.lpips_weights:
        lpips_fn = make_lpips_fn(
            load_lpips_params(cfg.lpips_weights, backbone=cfg.lpips_backbone)
        )
    else:
        print(
            "WARNING: cfg.lpips_weights empty -> perceptual loss DISABLED; "
            "the trained model will NOT match the reference loss landscape "
            "(if_nerf_clight.py:65-72 adds 0.1*LPIPS)."
        )

    tx, schedule = make_optimizer(
        lr=cfg.train.lr,
        end_lr=cfg.train.scheduler.end_lr,
        warmup_epochs=cfg.train.scheduler.warmup_epochs,
        decay_epochs=cfg.train.scheduler.decay_epochs,
        iters_per_epoch=cfg.ep_iter,
        weight_decay=cfg.train.weight_decay,
        optim=cfg.train.optim,
    )
    dataset = dataset or make_dataset(cfg, "train", smpl=smpl)

    if pipe.train_cull and pipe.train_cull_ratio <= 0:
        # train.cull_ratio <= 0 = "auto": size the culled-decode capacity
        # from the MEASURED survivor fraction of the first train samples.
        # Most of the culled-step win is capacity matching the data
        # (docs/SCALING.md attribution table: 0.120 -> 0.101 s/step from
        # sizing alone); the x1.3 margin covers jitter/pose wobble, and the
        # step's overflow stat + trainer warning still guard a miss.
        frac_fn = jax.jit(pipe.train_cull_fraction)
        fracs = [
            float(frac_fn(jax.tree.map(jnp.asarray, s.frame),
                          jax.tree.map(jnp.asarray, s.rays)))
            for s in (dataset.get_train_sample(i)
                      for i in range(min(8, len(dataset))))
        ]
        ratio = min(1.0, round(max(fracs) * 1.3 + 1e-3, 4))
        print(f"train.cull_ratio auto: survivor fraction "
              f"max {max(fracs):.4f} over {len(fracs)} samples "
              f"-> ratio {ratio}")
        pipe = pipe.clone(train_cull_ratio=ratio)

    step_kw = dict(
        lpips_fn=lpips_fn,
        l2_weight=cfg.l2rec_weight, lpips_weight=cfg.lpips_weight,
        patch_mode=cfg.patch.use_patch_sampling,
        perturb=cfg.perturb > 0,
        accum_steps=cfg.train.accum_steps,
    )
    if tp:
        from ..parallel.tp import make_tp_train_step

        step_fn = make_tp_train_step(pipe, tx, mesh, **step_kw)
    else:
        from ..registry import TRAINERS

        step_fn = TRAINERS.get(cfg.trainer)(pipe, tx, mesh=mesh, **step_kw)
    # cfg.use_record gates the metrics stream only (the reference's
    # tensorboard writer gate, recorder.py:49); the console line always prints
    recorder = Recorder(cfg.record_dir, cfg.record_interval, cfg.log_interval,
                        enabled=jax.process_index() == 0 and cfg.use_record)
    checkpointer = AsyncCheckpointer()

    # init / resume (ckpt loaded above, before build_runtime, for pe_table)
    start_epoch = 0
    if ckpt is not None:
        # direct construction: init_state would materialize throwaway Adam
        # zeros for every parameter right before they are replaced
        from ..train.step import TrainState

        params = jax.tree.map(jnp.asarray, ckpt["params"])
        if "opt_state" in ckpt:
            opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        else:
            # weights-only checkpoint (a CONVERTED official .pth carries no
            # optimizer state): fresh Adam moments, fine-tune from step 0
            print("checkpoint has no opt_state (weights-only / converted): "
                  "starting optimizer state fresh")
            opt_state = tx.init(params)
        state = TrainState(
            step=jnp.asarray(ckpt.get("step", 0)),
            params=params,
            opt_state=opt_state,
        )
        start_epoch = int(ckpt["epoch"]) + 1
        recorder.load_state_dict(ckpt.get("recorder", {}))
        print(f"resumed from {mdir} at epoch {start_epoch}")
    else:
        from ..testing import init_params

        sample0 = dataset.get_train_sample(0)
        params = init_params(model, sample0.frame, cluster.num_clusters,
                             jax.random.PRNGKey(cfg.seed))
        if cfg.pretrained and cfg.encoder_weights:
            # ImageNet ResNet18 init (reference encoder.py:77-79), converted
            # via tools/convert_resnet.py
            from ..tools.convert_resnet import apply_pretrained

            with np.load(cfg.encoder_weights) as z:
                params = apply_pretrained(params, dict(z))
            print(f"loaded pretrained encoder weights: {cfg.encoder_weights}")
        state = init_state(params, tx)
    if tp:
        # place params + Adam moments sharded over 'model' (fresh AND resume)
        from ..parallel.tp import shard_train_state

        state = shard_train_state(mesh, state)

    rng0 = jax.random.PRNGKey(cfg.seed)
    global_batch = n_dev * cfg.train.batch_size
    # multi-host: every process derives the same permutation (seeded) and
    # fetches only its contiguous slice of each global batch
    proc, n_proc = jax.process_index(), jax.process_count()
    local_batch = global_batch // n_proc

    for epoch in range(start_epoch, cfg.train.epoch):
        dataset.set_epoch(epoch)
        recorder.epoch = epoch
        ep_rng = np.random.default_rng(cfg.seed + epoch)
        # IterationBasedBatchSampler semantics (samplers.py:49-71): exactly
        # ep_iter steps per epoch, cycling a shuffled permutation
        need = cfg.ep_iter * global_batch
        perm = np.concatenate(
            [ep_rng.permutation(len(dataset)) for _ in
             range(-(-need // len(dataset)))]
        )[:need]

        # host input pipeline: prefetch the next batches (cv2 decode/augment
        # + device_put) on worker threads while the device runs the current
        # step — the DataLoader(num_workers) role (make_dataset.py:83-89).
        # get_train_sample is epoch+index-seeded, so worker order cannot
        # change the data (determinism contract).
        def fetch_batch(it):
            idx = perm[it * global_batch : (it + 1) * global_batch]
            idx = idx[proc * local_batch : (proc + 1) * local_batch]
            samples = [dataset.get_train_sample(int(i)) for i in idx]
            return shard_batch(mesh, stack_samples(samples))

        batches = Loader(
            fetch_batch,
            range(cfg.ep_iter),
            # num_workers<=0 -> Loader's synchronous path (0); otherwise
            # threaded with a +1 cushion like the reference's worker count
            num_workers=(0 if cfg.train.num_workers <= 0
                         else cfg.train.num_workers + 1),
            prefetch=2,
        )

        t_end = time.time()
        for it, batch in enumerate(batches):
            recorder.data_time.update(time.time() - t_end)
            # device trace of a post-compile window (SURVEY §5.1 plan;
            # profiling.py has the hooks, this is the CLI wiring)
            profiling = cfg.profile_dir and epoch == start_epoch
            # short-epoch safe: the window shrinks with ep_iter so the stop
            # iteration always exists (a started trace must ALWAYS be stopped
            # in the same epoch or it silently runs for the whole job)
            prof_stop = min(8, cfg.ep_iter - 1)
            prof_start = max(0, prof_stop - 3)
            if profiling and it == prof_start:
                jax.profiler.start_trace(cfg.profile_dir)

            state, stats = step_fn(
                state, batch, jax.random.fold_in(rng0, epoch * cfg.ep_iter + it)
            )
            if profiling and it == prof_stop:
                # forced scalar readback: block_until_ready does not
                # reliably block through the axon tunnel (CLAUDE.md), and
                # stop_trace would truncate the device trace
                float(stats["loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace (steps {prof_start}-{prof_stop}) "
                      f"written to {cfg.profile_dir}")
            recorder.step = epoch * cfg.ep_iter + it
            recorder.batch_time.update(time.time() - t_end)
            t_end = time.time()
            if it % cfg.log_interval == 0:
                stats_np = {k: float(v) for k, v in stats.items()}
                if stats_np.get("overflow", 0.0) > 0:
                    print(
                        "WARNING: train.cull capacity clipped an average of "
                        f"{stats_np['overflow']:.0f} active points/sample — "
                        "those lose contribution AND gradient; raise "
                        "train.cull_ratio"
                    )
                recorder.update(stats_np)
                lr = float(schedule(recorder.step))
                print(f"epoch {epoch} iter {it}/{cfg.ep_iter}  "
                      + recorder.console_line(cfg.train.epoch * cfg.ep_iter, lr))
            recorder.record("train")

        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": int(state.step),
            "recorder": recorder.state_dict(),
        }
        if pe_table is not None:
            # keep the converter-stored reference-op-exact PE table riding
            # every checkpoint this run writes (fine-tune parity)
            payload["pe_table"] = pe_table
        # async: only the device->host snapshot blocks; pickling + the
        # atomic writes overlap the next epoch (train/checkpoint.py).
        # EVERY process calls save — snapshotting multi-host TP-sharded
        # leaves is a collective — but only rank 0 writes files.
        checkpointer.save(
            mdir, payload, epoch,
            save_epoch_copy=(epoch + 1) % cfg.save_freq == 0,
            write=jax.process_index() == 0,
        )
    checkpointer.wait()
    recorder.close()
    return state


if __name__ == "__main__":
    main()
