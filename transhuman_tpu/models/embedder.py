"""Sin/cos frequency encodings (jnp, shape-polymorphic, jit-friendly).

Two encodings exist in the reference with the *same* output ordering but
different frequency bands:

* NeRF-style (`lib/networks/embedder.py:4-55`): freqs ``2**k`` for
  k=0..N-1, with the raw input prepended.  Used for view directions
  (view_res=4 -> 27-d) and world xyz (xyz_res=10 -> 63-d).
* pixelNeRF-style (`lib/networks/vision_transformer.py:100-136`): freqs
  ``pi * 2**k``.  Used for DPaRF local coords (KNN_FREQ=10, include_input
  -> 63-d) and the ViT token positional encoding (embed_dim//6 freqs,
  no input -> embed_dim).

Both implementations emit, for each frequency f, sin(f*v) over the full
input vector followed by cos(f*v) over the full input vector (verified
against embedder.py:25-28 and vision_transformer.py:115-133, which
interleave [f, f] rows with phases [0, pi/2]).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def freq_encode(x, num_freqs: int, freq_factor: float = 1.0, include_input: bool = True):
    """x: (..., D) -> (..., [D +] 2*num_freqs*D).

    Layout: [x?, sin(f0*x) (D), cos(f0*x) (D), sin(f1*x) (D), ...] with
    f_k = freq_factor * 2**k.
    """
    freqs = freq_factor * (2.0 ** np.arange(num_freqs))
    # (..., F, 1, D) * (F,) -> stack sin/cos per freq
    xf = x[..., None, :] * jnp.asarray(freqs, dtype=x.dtype)[:, None]  # (..., F, D)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    enc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)  # (...,F,2,D)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def nerf_embed_dim(num_freqs: int, d_in: int = 3, include_input: bool = True) -> int:
    return num_freqs * 2 * d_in + (d_in if include_input else 0)


def embed_xyz(x, num_freqs: int = 10):
    """World-coordinate xyz embedding (embedder.py:52): 63-d for 10 freqs."""
    return freq_encode(x, num_freqs, freq_factor=1.0, include_input=True)


def embed_viewdir(d, num_freqs: int = 4):
    """View-direction embedding (embedder.py:53): 27-d for 4 freqs."""
    return freq_encode(d, num_freqs, freq_factor=1.0, include_input=True)


def embed_dparf(x, num_freqs: int = 10):
    """DPaRF local-coordinate embedding (cross_transformer.py:106,191-192):
    pixelNeRF PE with pi-scaled freqs and the input prepended -> 63-d."""
    return freq_encode(x, num_freqs, freq_factor=float(np.pi), include_input=True)


def embed_vit_pos(x, embed_dim: int):
    """ViT token positional encoding of normalized canonical cluster centroids
    (vision_transformer.py:324,353-358): pi-scaled freqs, no input,
    embed_dim//6 freqs -> embed_dim channels."""
    if embed_dim % 6 != 0:
        raise ValueError(
            f"embed_vit_pos requires embed_dim % 6 == 0, got {embed_dim} "
            "(each frequency contributes sin+cos over 3 coords)."
        )
    return freq_encode(
        x, embed_dim // 6, freq_factor=float(np.pi), include_input=False
    )
