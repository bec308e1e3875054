"""A/B the transposed DPaRF kernel (experiments/dparf2) vs the XLA composition
and the v1 kernel on the real chip.  One process, forced readback."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.experiments.dparf2 import dparf_fused2
from transhuman_tpu.models.heads import dparf_representation

N, C, V, D = 1_048_576, 300, 3, 192
CHUNK = 32768

k0 = jax.random.PRNGKey(0)
pts = jax.jit(lambda k: jax.random.normal(k, (N, 3)) * 0.4)(k0)
centers = jax.jit(lambda k: jax.random.normal(k, (C, 3)) * 0.4)(jax.random.PRNGKey(1))
rot = jnp.tile(jnp.eye(3)[None], (C, 1, 1))
tokens = jax.jit(lambda k: jax.random.normal(k, (V, C, D), jnp.bfloat16))(jax.random.PRNGKey(2))


def _force(r):
    return float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])


def t(f, *a, n=5):
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        _force(f(*a))
    return (time.perf_counter() - t0) / n


@jax.jit
def xla_path(pts, centers, rot, tokens):
    def body(p):
        rep, _ = dparf_representation(p, centers, rot, tokens)
        return rep.astype(jnp.float32).sum(axis=(0, 2))
    return jax.lax.map(body, pts.reshape(-1, CHUNK, 3))


@jax.jit
def v2_path(pts, centers, rot, tokens):
    def body(p):
        tok, pe, dist = dparf_fused2(p, centers, rot, tokens)
        return (tok.astype(jnp.float32).sum(axis=(0, 2))
                + pe.sum(axis=1) * 3 + dist[:, 0] * 0)
    return jax.lax.map(body, pts.reshape(-1, CHUNK, 3))


print(f"xla   {t(xla_path, pts, centers, rot, tokens)*1e3:8.2f} ms", flush=True)
print(f"v2    {t(v2_path, pts, centers, rot, tokens)*1e3:8.2f} ms", flush=True)

# numerical cross-check on the device too (one chunk)
tok, pe, dist = dparf_fused2(pts[:CHUNK], centers, rot, tokens)
rep, _ = dparf_representation(pts[:CHUNK], centers, rot, tokens)
err_tok = float(jnp.max(jnp.abs(tok.astype(jnp.float32) - rep[..., :D].astype(jnp.float32))))
err_pe = float(jnp.max(jnp.abs(pe - rep[0, :, D:].astype(jnp.float32))))
print(f"device tok err {err_tok:.2e}  pe err {err_pe:.2e}", flush=True)
