"""Benchmark: full-frame inference throughput (rays/sec/chip) + train-step time.

Inference mirrors the reference's eval workload (render_fast,
if_clight_renderer.py:429-484): a 512x512 novel-view render — here 65,536
body-region rays x 64 stratified samples through the full pipeline (3-view
ResNet encode, SMPL painting, TransHE, chunked DPaRF/NeRF queries with
SMPL-distance culling, alpha compositing).

Training mirrors the reference's per-iteration step (trainer.py:65-96 /
if_nerf_clight.py:39-81): one sample/chip, 2400 rays x 64 samples, full
forward+backward+Adam update INCLUDING the 0.1x VGG16-LPIPS perceptual term
on the 6 patches the reference always pays (if_nerf_clight.py:65-72; random
weights at the exact VGG16 shapes — the pretrained file is license-gated),
at the train config of record (BASELINE.md).

Prints ONE JSON line. Primary fields {"metric","value","unit","vs_baseline"}
are the render throughput (the driver's headline). Extra fields carry the
train-step time and the baseline provenance:

  vs_baseline: the reference publishes no throughput number (BASELINE.md);
  the denominator is a pinned ENGINEERING ESTIMATE of the CUDA reference on
  one V100 (69k valid rays/frame at ~1.4 s/frame for the render_fast path)
  — labeled in the "baseline" field so the ratio is not mistaken for a
  measured comparison. Same for the train-step estimate (~0.6 s/iter/V100
  from the 8xV100 x 500 iters/epoch x 3000 epoch schedule at the reported
  multi-day wall time; see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: first run pays the (slow, tunneled) XLA:TPU
# compile; subsequent runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RAYS_PER_SEC = 50_000.0  # estimate — see module docstring
REFERENCE_TRAIN_STEP_SEC = 0.6  # estimate — see module docstring

# TPU v5e single-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM).
# MFU/roofline denominators for the fields below; docs/PERF.md carries the
# roofline table these feed.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9

N_RAYS = 65_536
N_SAMPLES = 64
CHUNK_RAYS = 512  # 32768 points/chunk, the reference chunk size; fastest measured
IMAGE_HW = (512, 512)
COMPACT_RATIO = 0.1875  # static-capacity compaction (render/pipeline.py):
# the cull prefilter superset measures 17.1% of samples on this exact
# (fixed-seed) workload (exact cull 15.1%), so 0.1875 keeps ~9% headroom —
# deterministic rays make that safe — and the overflow assert below
# guarantees the output is identical to the uncompacted path

# opt-in per-vertex-radii cull row (cfg.cull_radii; docs/PERF.md
# "Per-vertex cull radii"): uniform 0.05 m reach instead of the reference's
# 0.1 m shell.  Superset fraction measured 0.1185 on this workload
# (tools/probe_radii_perf.py) -> ratio 0.134 holds with margin (asserted).
# SEMANTICS CHANGE: the JSON carries the measured delta vs the shell render
# (psnr_radii_vs_shell).  On random bench weights density fills the whole
# shell, so this is the WORST-case delta; on a trained model the radii come
# from tools/measure_vertex_radii.py, which keeps every significant
# contribution by construction.
RADII_REACH = 0.05
RADII_RATIO = 0.134


def _cost_analysis(jitted, *args):
    """(flops, hbm_bytes) of the exact compiled executable being timed,
    from XLA's HloCostAnalysis (an analytic count over the optimized HLO:
    matmul/conv FLOPs by shape arithmetic; bytes-accessed as operand +
    output buffer traffic per op, post-fusion).  The persistent compile
    cache makes the .lower().compile() a cache hit of the program the
    timing loop runs.  Returns (None, None) where the backend does not
    expose cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"NOTE: cost_analysis unavailable ({e})", file=sys.stderr)
        return None, None


def _roofline_fields(prefix, seconds, flops, hbm_bytes):
    """MFU + HBM-utilization JSON fields for one measured program."""
    if flops is None or seconds is None:
        return {}
    return {
        f"mfu_{prefix}": round(flops / seconds / V5E_PEAK_BF16_FLOPS, 4),
        f"hbm_util_{prefix}": round(
            hbm_bytes / seconds / V5E_PEAK_HBM_BYTES, 4),
        f"{prefix}_tflops": round(flops / 1e12, 3),
        f"{prefix}_hbm_gb": round(hbm_bytes / 1e9, 3),
    }


def bench_render():
    from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup

    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=IMAGE_HW,
        n_verts=6890,
        n_clusters=300,
        n_samples=N_SAMPLES,
        chunk_rays=CHUNK_RAYS,
        dtype=jnp.bfloat16,
        compact_ratio=COMPACT_RATIO,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(N_RAYS)

    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, rays)

    render = jax.jit(lambda p, f, r: pipe.render_frame(p, f, r))

    # warmup / compile; NOTE a scalar host readback per iteration — through
    # the axon tunnel, block_until_ready alone does not reliably drain the
    # dispatch queue, which silently overstates throughput
    out = render(params, frame, rays)
    float(jnp.sum(out["acc_map"]))
    overflow = int(np.asarray(out.get("overflow", [0]))[0])
    assert overflow == 0, (
        f"compaction capacity clipped {overflow} points — the number below "
        "would not be an honest apples-to-apples render"
    )

    # steady-state PIPELINED throughput: dispatch frame i+1 before the
    # forced readback of frame i — exactly the product eval loop's schedule
    # (cli/run.py::_pipelined) — so the ~25 ms tunnel dispatch overlaps the
    # device render.  The one-frame-behind scalar readback still forces every
    # frame to completion, so the tunnel queue cannot inflate the number
    # (CLAUDE.md timing discipline: block_until_ready alone doesn't drain it).
    def timed(fn):
        n_iters = 10
        t0 = time.perf_counter()
        prev = None
        for _ in range(n_iters):
            o = fn(params, frame, rays)
            if prev is not None:
                float(jnp.sum(prev["acc_map"]))
            prev = o
        float(jnp.sum(prev["acc_map"]))
        return (time.perf_counter() - t0) / n_iters, prev

    dt, _ = timed(render)
    flops, hbm = _cost_analysis(render, params, frame, rays)

    # opt-in per-vertex-radii row (see RADII_REACH above): tighter reach ->
    # smaller decode capacity -> fewer descriptors on the issue-bound path.
    # clone() shares the shell pipe's fine-cull partition / PE table so the
    # two rows can only differ by the radii + ratio being measured.
    pipe_r = pipe.clone(
        compact_ratio=RADII_RATIO,
        vertex_radii=np.full(smpl.v_template.shape[0], RADII_REACH,
                             np.float32),
    )
    render_r = jax.jit(pipe_r.render_frame)
    out_r = render_r(params, frame, rays)
    over_r = int(np.asarray(out_r["overflow"])[0])
    assert over_r == 0, f"radii-cull capacity clipped {over_r} points"
    dt_r, last_r = timed(render_r)
    rgb = np.asarray(out["rgb_map"], np.float32)
    rgb_r = np.asarray(last_r["rgb_map"], np.float32)
    mse = float(np.mean((rgb - rgb_r) ** 2))
    radii_fields = {
        # field name derives from the constant so retuning RADII_REACH
        # cannot leave a stale label in the JSON
        f"rays_per_sec_radii_cull_{RADII_REACH}": round(N_RAYS / dt_r, 1),
        "psnr_radii_vs_shell": round(
            float(-10 * np.log10(max(mse, 1e-12))), 2),
    }
    return N_RAYS / dt, dt, flops, hbm, radii_fields


def bench_train_step():
    from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
    from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
    from transhuman_tpu.train.step import init_state

    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=IMAGE_HW,
        n_verts=6890,
        n_clusters=300,
        n_samples=N_SAMPLES,
        dtype=jnp.bfloat16,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(2400)
    rng = np.random.default_rng(0)
    sample = TrainSample(
        frame=frame,
        rays=rays,
        target_patches=rng.random((6, 20, 20, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(2400, dtype=np.int32),
    )
    batch = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), sample)
    float(jnp.sum(batch.rays.ray_o))  # force-resident before timing

    # the reference ALWAYS pays a VGG16 LPIPS forward+backward on the 6
    # patches (if_nerf_clight.py:65-72); carry the same term.  Pretrained
    # weights are license-gated here, so the benched step uses random
    # weights at the exact VGG16 shapes — identical FLOPs/memory traffic.
    from transhuman_tpu.models.lpips import init_lpips_params, make_lpips_fn

    lpips_fn = make_lpips_fn(init_lpips_params(jax.random.PRNGKey(1)))

    tx, _ = make_optimizer()
    step = make_train_step(pipe, tx, lpips_fn=lpips_fn, donate=False)
    state = init_state(params, tx)
    state, stats = step(state, batch, jax.random.PRNGKey(0))  # compile
    float(stats["loss"])

    # steady-state timing, exactly like cli/train.py's loop: consecutive
    # steps are data-dependent (state chains through the device) so they
    # CANNOT reorder, and the product loop only reads stats back every
    # log_interval steps — so time N chained steps bounded by ONE forced
    # scalar readback at the tail (the per-step readback added ~30 ms of
    # pure tunnel dispatch per step that no real training run pays).
    n_chain, n_rep = 5, 3
    times = []
    for r in range(n_rep):
        t0 = time.perf_counter()
        for i in range(n_chain):
            state, stats = step(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(1), r * n_chain + i),
            )
        float(stats["loss"])  # tail readback drains the tunnel queue
        times.append((time.perf_counter() - t0) / n_chain)
    flops, hbm = _cost_analysis(
        step, state, batch, jax.random.PRNGKey(2))

    # opt-in culled-training row (cfg.train.cull, docs/SCALING.md): same
    # step with the decode culled+compacted at ratio 0.25 — a deliberate
    # semantics change (off-body points get no gradient), reported as a
    # separate field, overflow-asserted on EVERY step read back (the
    # per-step stratified jitter re-rolls the survivor count, so a
    # warmup-only assert would not certify the timed steps)
    pipe_c = pipe.clone(train_cull=True, train_cull_ratio=0.25)
    step_c = make_train_step(pipe_c, tx, lpips_fn=lpips_fn, donate=False)
    state_c, stats_c = step_c(init_state(params, tx), batch,
                              jax.random.PRNGKey(0))
    float(stats_c["loss"])
    assert float(stats_c["overflow"]) == 0.0, "train.cull capacity clipped"
    times_c = []
    for r in range(n_rep):
        t0 = time.perf_counter()
        for i in range(n_chain):
            state_c, stats_c = step_c(
                state_c, batch,
                jax.random.fold_in(jax.random.PRNGKey(3), r * n_chain + i),
            )
        float(stats_c["loss"])
        times_c.append((time.perf_counter() - t0) / n_chain)
        # outside the timed window; only the tail step's stats survive the
        # chain, so this certifies the capacity at 1-in-n_chain granularity
        # (stats of intermediate steps are overwritten device-side)
        assert float(stats_c["overflow"]) == 0.0, (
            f"train.cull capacity clipped during timed rep {r}")

    # field name derives from the knob so retuning the ratio can't leave a
    # stale label (same rule as the radii field above)
    key_c = f"train_step_sec_culled_{pipe_c.train_cull_ratio}"
    return (float(np.median(times)), flops, hbm,
            {key_c: round(float(np.median(times_c)), 4)})


def bench_eval_protocol(n_frames=6):
    """End-to-end eval-loop throughput (frames/s): host input path +
    pipelined render with overflow auto-recovery + PSNR/SSIM metrics
    (image dumps off — see below) — the cli/run.py evaluate loop, on the synthetic
    512x512 dataset (the kernel bench above is blind to host-path
    regressions; this field is the guard).  Timed on a second pass so the
    first pass absorbs compiles."""
    import contextlib
    import tempfile

    from transhuman_tpu.cli.run import evaluate_frames
    from transhuman_tpu.config import Config
    from transhuman_tpu.data.synthetic import SyntheticDataset
    from transhuman_tpu.registry import EVALUATORS
    from transhuman_tpu.testing import init_params, synthetic_setup

    model, pipe, frame, smpl, cluster = synthetic_setup(
        image_hw=IMAGE_HW,
        n_verts=6890,
        n_clusters=300,
        n_samples=N_SAMPLES,
        chunk_rays=CHUNK_RAYS,
        dtype=jnp.bfloat16,
        compact_ratio=COMPACT_RATIO,
    )
    params = init_params(model, frame, cluster.num_clusters,
                         jax.random.PRNGKey(0))
    import shutil

    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    cfg = Config().merge_dict({
        "run_mode": "test",
        "N_samples": N_SAMPLES,
        "test": {"full_eval": True},
        "pad_bucket": N_RAYS,  # 65536-ray buckets: eval frames whose box
        # rays fit reuse the exact render program the kernel bench compiled
        "result_dir": tmp,
        "smpl_dir": "/nonexistent",
        "kmeans_dir": "/nonexistent",
    })
    dataset = SyntheticDataset(cfg, "test", n_frames=n_frames,
                               image_hw=IMAGE_HW, smpl=smpl)
    try:
        times = []
        for _ in range(2):  # pass 1 compiles/warms; pass 2 = measurement
            # save_images=False: the field times the loop (host input +
            # render + metrics), and repeated bench runs must not
            # accumulate 512x512 dumps in /tmp
            ev = EVALUATORS.get(cfg.evaluator)(
                tmp, lpips_fn=None, save_images=False, exp_name="bench",
                epoch=0)
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(sys.stderr):
                evaluate_frames(cfg, pipe, params, dataset, ev)
            times.append(time.perf_counter() - t0)
        return n_frames / times[-1]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    (rays_per_sec, render_dt, render_flops, render_hbm,
     radii_fields) = bench_render()
    train_step_sec, train_flops, train_hbm, cull_fields = bench_train_step()
    eval_fps = bench_eval_protocol()
    fields = {
        "metric": "rays_per_sec_512x512_render",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        "baseline": f"estimate_{int(REFERENCE_RAYS_PER_SEC/1000)}k_rays_per_sec_1xV100",
        "train_step_sec": round(train_step_sec, 4),
        "train_vs_baseline": round(REFERENCE_TRAIN_STEP_SEC / train_step_sec, 3),
        "train_baseline": "estimate_0.6s_per_iter_1xV100",
        # secondary: the full eval loop (host input + render + metrics),
        # regression guard for the host path
        "eval_frames_per_sec_512": round(eval_fps, 3),
        # roofline accounting (XLA HloCostAnalysis over the compiled
        # programs / v5e peaks: 197 bf16 TFLOP/s, 819 GB/s HBM); the
        # descriptor-bound argument in docs/PERF.md is quantified by how far
        # BOTH utilizations sit below 1.0 at the measured times
        "peaks": "v5e: 197 TFLOP/s bf16, 819 GB/s HBM",
    }
    fields.update(radii_fields)
    fields.update(cull_fields)
    fields.update(_roofline_fields("render", render_dt, render_flops,
                                   render_hbm))
    fields.update(_roofline_fields("train", train_step_sec, train_flops,
                                   train_hbm))
    print(json.dumps(fields))


if __name__ == "__main__":
    main()
