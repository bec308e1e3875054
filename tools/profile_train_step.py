"""Train-step wall time at reference scale (1 sample/chip, 2400x64 rays)."""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state

model, pipe, frame, _, cluster = synthetic_setup(
    image_hw=(512,512), n_verts=6890, n_clusters=300, n_samples=64, dtype=jnp.bfloat16)
params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
rays = synthetic_rays(2400)
rng = np.random.default_rng(0)
sample = TrainSample(frame=frame, rays=rays,
    target_patches=rng.random((6,20,20,3)).astype(np.float32),
    ray_pixel_idx=np.arange(2400, dtype=np.int32))
batch = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), sample)
float(jnp.sum(batch.rays.ray_o))  # force-resident
tx, _ = make_optimizer()
step = make_train_step(pipe, tx, donate=False)
state = init_state(params, tx)
state, stats = step(state, batch, jax.random.PRNGKey(0))
print("first loss", float(stats["loss"]), flush=True)
times = []
for i in range(10):
    t0 = time.perf_counter()
    state, stats = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
    _ = float(stats["loss"])  # forced readback drains the queue
    times.append(time.perf_counter() - t0)
print("step times:", [round(t,3) for t in times], flush=True)
print("median step:", np.median(times), flush=True)

# --- breakdown variants (argv: fwd, nosamplegrad) ---------------------------
import sys

def _timeit(f, *a, n=8):
    r = f(*a); float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

if "fwd" in sys.argv:
    from transhuman_tpu.train.loss import patch_losses

    @jax.jit
    def fwd(params, s, rng):
        out = pipe.render_train(params, s.frame, s.rays, rng)
        l, _ = patch_losses(out["rgb_map"], s, None, 1.0, 0.1)
        return l

    # device-resident args — numpy leaves would re-upload ~10 MB per call
    # through the tunnel and dominate the measurement (learned the hard way:
    # a numpy `sample` made this read 512 ms for a ~150 ms fwd)
    sample_dev = jax.tree.map(jnp.asarray, sample)
    jax.block_until_ready(jax.tree.leaves(sample_dev)[0])
    print(f"fwd-only     {_timeit(fwd, state.params, sample_dev, jax.random.PRNGKey(2))*1e3:8.1f} ms", flush=True)

if "render" in sys.argv:
    # render_train without the loss, device args
    @jax.jit
    def rt(params, s, rng):
        return pipe.render_train(params, s.frame, s.rays, rng)["rgb_map"]

    sample_dev = jax.tree.map(jnp.asarray, sample)
    jax.block_until_ready(jax.tree.leaves(sample_dev)[0])
    print(f"render-only  {_timeit(rt, state.params, sample_dev, jax.random.PRNGKey(2))*1e3:8.1f} ms", flush=True)

if "chain" in sys.argv:
    # Chained-timing variant matrix (the bench.py discipline: 5 data-dependent
    # steps per rep, ONE tail readback — what cli/train.py actually pays
    # between log_interval readbacks).  Isolates what the ~170 ms backward is
    # made of at steady state, where gathers/DMA overlap compute.
    from transhuman_tpu.models.lpips import init_lpips_params, make_lpips_fn
    import transhuman_tpu.render.pipeline as P
    from transhuman_tpu.ops.sampling import sample_feature_map as _orig

    lpips_fn = make_lpips_fn(init_lpips_params(jax.random.PRNGKey(1)))

    def chain_time(step_fn, n_chain=5, n_rep=3):
        s = init_state(params, tx)
        s, st = step_fn(s, batch, jax.random.PRNGKey(0))
        float(st["loss"])
        ts = []
        for r in range(n_rep):
            t0 = time.perf_counter()
            for i in range(n_chain):
                s, st = step_fn(
                    s, batch, jax.random.fold_in(jax.random.PRNGKey(1), r * n_chain + i))
            float(st["loss"])
            ts.append((time.perf_counter() - t0) / n_chain)
        return float(np.median(ts))

    for label, lp, stopgrad in [
        ("base (no lpips)      ", None, False),
        ("+lpips (bench cfg)   ", lpips_fn, False),
        ("stopgrad-sampling    ", None, True),
        ("stopgrad + lpips     ", lpips_fn, True),
    ]:
        if stopgrad:
            P.sample_feature_map = lambda *a, **k: jax.lax.stop_gradient(_orig(*a, **k))
        try:
            fn = make_train_step(pipe, tx, lpips_fn=lp, donate=False)
            print(f"chain {label} {chain_time(fn)*1e3:8.1f} ms/step", flush=True)
        finally:
            P.sample_feature_map = _orig

if "nosamplegrad" in sys.argv:
    import transhuman_tpu.render.pipeline as P
    from transhuman_tpu.ops.sampling import sample_feature_map as _orig

    P.sample_feature_map = lambda *a, **k: jax.lax.stop_gradient(_orig(*a, **k))
    step2 = make_train_step(pipe, tx, donate=False)
    s2, st2 = step2(init_state(state.params, tx), batch, jax.random.PRNGKey(0))
    print(f"stop-grad-sampling step {_timeit(lambda: step2(s2, batch, jax.random.PRNGKey(3)))*1e3:8.1f} ms", flush=True)
    P.sample_feature_map = _orig
