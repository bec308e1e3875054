"""dparf_dense_weights == scatter(softmax(topk)) reference."""

import numpy as np
import jax.numpy as jnp

from transhuman_tpu.ops import knn as K


def test_dense_weights_match_softmax_scatter(rng):
    n, c, k, alpha = 128, 50, 7, 0.5
    d2 = np.abs(rng.standard_normal((n, c))).astype(np.float32)
    w_dense, dist, _, w_knn = K.dparf_dense_weights(jnp.asarray(d2), k, alpha)
    w_dense, dist, w_knn = map(np.asarray, (w_dense, dist, w_knn))

    order = np.argsort(d2, axis=1)[:, :k]
    d_ref = np.sqrt(np.take_along_axis(d2, order, 1))
    e = np.exp(-d_ref / alpha)
    w_ref = e / e.sum(1, keepdims=True)

    np.testing.assert_allclose(dist, d_ref, atol=1e-5)
    dense_ref = np.zeros((n, c), np.float32)
    np.put_along_axis(dense_ref, order, w_ref, axis=1)
    np.testing.assert_allclose(w_dense, dense_ref, atol=1e-5)
    np.testing.assert_allclose(w_dense.sum(1), 1.0, atol=1e-5)
    assert ((w_dense > 0).sum(1) == k).all()

    # the compact (N, k) weights are the softmax itself, and agree with the
    # dense scatter column-for-column (models/heads.py relies on this)
    np.testing.assert_allclose(w_knn, w_ref, atol=1e-5)
    np.testing.assert_allclose(
        w_knn, np.take_along_axis(np.asarray(w_dense), order, 1), atol=1e-7
    )
