"""Pallas KNN kernel vs brute force (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.ops.knn_pallas import knn_pallas


def brute(q, p, k, mask=None):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d = np.where(mask[None, :], d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_pallas_knn_exact():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    p = rng.standard_normal((300, 3)).astype(np.float32)
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(p), None, 8)
    bd, _ = brute(q, p, 8)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-4, atol=1e-5)
    dd = ((q[:, None, :] - p[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(dd, bd, rtol=1e-4, atol=1e-5)


def test_pallas_knn_masked():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((32, 3)).astype(np.float32)
    p = rng.standard_normal((200, 3)).astype(np.float32)
    mask = rng.uniform(size=200) > 0.4
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), 4)
    assert mask[np.asarray(i)].all()
    bd, _ = brute(q, p, 4, mask)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-4, atol=1e-5)


def test_pallas_knn_grad():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))

    def loss(q, p):
        d, _ = knn_pallas(q, p, None, 2)
        return jnp.sum(d * jnp.arange(1.0, 3.0))

    gq, gp = jax.grad(loss, argnums=(0, 1))(q, p)
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gp)).all()
    # numeric check against finite differences on one coordinate
    eps = 1e-3
    qp = q.at[3, 1].add(eps)
    qm = q.at[3, 1].add(-eps)
    fd = (loss(qp, p) - loss(qm, p)) / (2 * eps)
    np.testing.assert_allclose(float(gq[3, 1]), float(fd), rtol=2e-2,
                               atol=1e-3)
