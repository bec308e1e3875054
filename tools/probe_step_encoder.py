"""In-step ablation of the ENCODER's share of the train step.

The chained matrix (profile_train_step.py chain) pins sampling-bwd at
~108 ms of the ~212 ms step; this maps the remaining ~104 ms.  Variants
(chained 5-step timing, one tail readback — the bench discipline):

  base            the shipping step
  sg-pixelfeat    stop_gradient at the sampler output (kills sampling-bwd
                  AND the pixel-side encoder backward) — the existing
                  "stopgrad-sampling" 104 ms reference point
  sg-encoder      stop_gradient on BOTH encode_views outputs (holder +
                  pixel maps): encoder backward fully removed, sampling
                  backward still runs through d_feat -> (dead) cotangent?
                  No: d_feat's consumer is gone, so XLA DCEs the sampling
                  backward too — this isolates step minus encoder-bwd
                  minus sampling-bwd.
  const-encoder   encode_views replaced by constants (fwd AND bwd gone):
                  the delta vs sg-encoder is the encoder FORWARD's
                  in-step cost.
  cheap-dfeat     the sampler's custom VJP returns a data-dependent dense
                  FILL for d_feat (mean(g) broadcast) instead of the
                  sort + 4x segment-sum: the encoder backward still runs
                  over a dense cotangent, so base - cheap-dfeat is the
                  d_feat engine's true in-step cost and
                  cheap-dfeat - sg-encoder is the encoder backward's.
  maxpool-tree    max_pool_3x3_s2 as a tree of 9 shifted strided slices
                  under jnp.maximum: the backward becomes dense selects
                  instead of reduce_window's SelectAndScatter transpose.
                  (Tie-handling differs: jnp.maximum splits gradient 0.5/
                  0.5 at exact ties vs SelectAndScatter's route-to-first;
                  total gradient mass is conserved either way.)

NOTE sg-pixelfeat patches BOTH sample_feature_map call sites (vertex
painting AND pixel features), so it kills the entire encoder backward
too — that is why it measures equal to sg-encoder.

MEASURED (v5e, 2026-08-17): base 213.3 / sg-pixelfeat 104.9 /
sg-encoder 105.0 / const-encoder 91.7 / cheap-dfeat 129.7 /
maxpool-tree 225.9 ms/step.
=> d_feat engine 83.6 ms, encoder-bwd + painting-VJP 24.7 ms, encoder
fwd 13.3 ms, everything else ~92 ms.  maxpool-tree is 12.6 ms WORSE:
reduce_window's SelectAndScatter transpose is NOT a bottleneck here —
the 9-slice maximum tree pays more in slice/select traffic than the
transpose saves.  Closed negative; keep reduce_window.

In-step ablation, not isolated probes: see experiments/streamscatter.py for
why isolated numbers mislead here.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.models.network import TransHumanNet
import transhuman_tpu.render.pipeline as P
from transhuman_tpu.ops.sampling import sample_feature_map as _orig_sample
from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup
from transhuman_tpu.train import TrainSample, make_optimizer, make_train_step
from transhuman_tpu.train.step import init_state

_orig_encode = TransHumanNet.encode_views


def main():
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(512, 512), n_verts=6890, n_clusters=300, n_samples=64,
        dtype=jnp.bfloat16)
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(2400)
    rng = np.random.default_rng(0)
    sample = TrainSample(
        frame=frame, rays=rays,
        target_patches=rng.random((6, 20, 20, 3)).astype(np.float32),
        ray_pixel_idx=np.arange(2400, dtype=np.int32))
    batch = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[None]), sample)
    float(jnp.sum(batch.rays.ray_o))
    tx, _ = make_optimizer()

    def chain_time(step_fn, n_chain=5, n_rep=3):
        s = init_state(params, tx)
        s, st = step_fn(s, batch, jax.random.PRNGKey(0))
        float(st["loss"])
        ts = []
        for r in range(n_rep):
            t0 = time.perf_counter()
            for i in range(n_chain):
                s, st = step_fn(
                    s, batch,
                    jax.random.fold_in(jax.random.PRNGKey(1), r * n_chain + i))
            float(st["loss"])
            ts.append((time.perf_counter() - t0) / n_chain)
        return float(np.median(ts))

    def sg_encode(self, images):
        h, p = _orig_encode(self, images)
        return jax.lax.stop_gradient(h), jax.lax.stop_gradient(p)

    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def cheap_sample(feat, uv, image_shape):
        return _orig_sample(feat, uv, image_shape)

    def cheap_fwd(feat, uv, image_shape):
        out = _orig_sample(feat, uv, image_shape)
        return out, (feat.shape, jnp.zeros((), feat.dtype),
                     uv.shape, jnp.zeros((), uv.dtype))

    def cheap_bwd(image_shape, res, g):
        fshape, fproto, uvshape, uvproto = res
        fill = jnp.mean(g.astype(jnp.float32))  # data-dependent: no folding
        return (
            jnp.broadcast_to(fill.astype(fproto.dtype), fshape),
            jnp.zeros(uvshape, uvproto.dtype),
        )

    cheap_sample.defvjp(cheap_fwd, cheap_bwd)

    # encoder.py imports the symbol directly: patch ITS module binding
    import transhuman_tpu.models.encoder as E
    _orig_pool = E.max_pool_3x3_s2

    def tree_pool(x):
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        h_out = x.shape[1] // 2
        w_out = x.shape[2] // 2
        y = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (xp.shape[0], dy + 2 * h_out - 1, dx + 2 * w_out - 1,
                     xp.shape[3]),
                    (1, 2, 2, 1))
                y = s if y is None else jnp.maximum(y, s)
        return y

    def const_encode(self, images):
        h, p = _orig_encode(self, images)
        # keep shapes/dtypes; drop the real computation from the graph
        return (
            jnp.full(h.shape, 0.01, h.dtype),
            jnp.full(p.shape, 0.01, p.dtype),
        )

    variants = [
        ("base         ", None, None),
        ("sg-pixelfeat ", "sg", None),
        ("sg-encoder   ", None, sg_encode),
        ("const-encoder", None, const_encode),
        ("cheap-dfeat  ", "cheap", None),
        ("maxpool-tree ", "pool", None),
    ]
    picked = [v for v in variants if v[0].strip() in sys.argv[1:]] or variants
    for label, sg_sample, enc in picked:
        if sg_sample == "sg":
            P.sample_feature_map = (
                lambda *a, **k: jax.lax.stop_gradient(_orig_sample(*a, **k)))
        elif sg_sample == "cheap":
            P.sample_feature_map = cheap_sample
        elif sg_sample == "pool":
            E.max_pool_3x3_s2 = tree_pool
        if enc is not None:
            TransHumanNet.encode_views = enc
        try:
            fn = make_train_step(pipe, tx, donate=False)
            print(f"{label} {chain_time(fn)*1e3:8.1f} ms/step", flush=True)
        finally:
            P.sample_feature_map = _orig_sample
            TransHumanNet.encode_views = _orig_encode
            E.max_pool_3x3_s2 = _orig_pool


if __name__ == "__main__":
    main()
