"""Isolated d_feat backward timing: stream-scatter kernel vs XLA path,
with a real (data-dependent) cotangent and an optional vmap(1) wrapper.

Measured (v5e, train scale, uniform uv): xla novmap 66.4 / vmap1 68.2,
kernel novmap 30.8 / vmap1 46.7 ms/iter — the kernel WINS isolated, yet
loses inside the full train step (see experiments/streamscatter.py docstring
and tools/probe_step_ablate.py).  Lesson: an all-ones cotangent
(loss=sum) lets XLA fold the row-gather and understates the XLA path;
always probe with a weighted cotangent, and never trust isolated-op
numbers for step-level decisions.
"""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import transhuman_tpu.ops.sampling as sampling

print('platform:', jax.devices()[0].platform, flush=True)

V, HF, WF, C = 3, 512, 512, 384
N = 2400 * 64
feat = jax.jit(lambda k: jax.random.normal(k, (V, HF, WF, C), jnp.bfloat16))(jax.random.PRNGKey(0))
uv = jax.jit(lambda k: jax.random.uniform(k, (V, N, 2), jnp.float32, 1.0, HF - 2))(jax.random.PRNGKey(1))
w = jax.jit(lambda k: jax.random.normal(k, (V, N, C), jnp.bfloat16))(jax.random.PRNGKey(2))


def loss(feat, uv, w):
    out = sampling.sample_feature_map(feat, uv, (HF, WF))
    return (out * w).astype(jnp.float32).sum()


def mk(n_, vmapped):
    g1 = jax.grad(loss, 0)
    gfn = jax.vmap(g1) if vmapped else g1

    def f(feat, uv, w):
        if vmapped:
            feat_, uv_, w_ = feat[None], uv[None], w[None]
        else:
            feat_, uv_, w_ = feat, uv, w

        def body(i, acc):
            u2 = uv_ + (i * 1e-6)
            g = gfn(feat_, u2, w_)
            return acc + g.astype(jnp.float32).ravel()[0]

        return jax.lax.fori_loop(0, n_, body, jnp.float32(0.0))

    return f


def force(r):
    return float(np.asarray(r))


def t(f, *a, n_=3):
    force(f(*a)); t0 = time.perf_counter()
    for _ in range(n_):
        force(f(*a))
    return (time.perf_counter() - t0) / n_


for flag, name in [(False, 'xla   '), (None, 'kernel')]:
    for vmapped in (False, True):
        sampling.USE_STREAM_SCATTER = flag
        t1 = t(jax.jit(mk(1, vmapped)), feat, uv, w)
        t4 = t(jax.jit(mk(4, vmapped)), feat, uv, w)
        tag = 'vmap1 ' if vmapped else 'novmap'
        print(f'{name} {tag} grad-feat {(t4-t1)/3*1e3:8.2f} ms/iter '
              f'(single {t1*1e3:6.1f})', flush=True)
