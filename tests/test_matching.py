import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.models.matching import (
    FineMatching,
    S2DMatching,
    coarse_loss,
    fine_loss_l2,
    fine_loss_l2_std,
    gather_windows,
    mutual_nearest_matches,
    sigmoid_focal_loss,
)
from nerfloc_tpu.models.transformer import SelfCrossTransformer


def test_focal_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    targets = jnp.asarray((rng.uniform(size=(8, 5)) > 0.7).astype(np.float32))
    out = np.asarray(sigmoid_focal_loss(logits, targets))
    # reference formula (sparse_to_dense.py:45-70)
    l, t = np.asarray(logits), np.asarray(targets)
    pred = 1 / (1 + np.exp(-l))
    alpha_w = t * 0.25 + (1 - t) * 0.75
    pt = t * (1 - pred) + (1 - t) * pred
    bce = np.maximum(l, 0) - l * t + np.log1p(np.exp(-np.abs(l)))
    np.testing.assert_allclose(out, alpha_w * pt ** 2 * bce, rtol=1e-5, atol=1e-6)


def test_mutual_nearest_static():
    scores = jnp.array([
        [0.9, 0.1, 0.1],
        [0.8, 0.85, 0.1],   # row max col0=0.9 elsewhere -> col1 mutual
        [0.05, 0.1, 0.15],  # below thr
    ])
    j, mask = mutual_nearest_matches(scores, thr=0.2)
    assert list(np.asarray(j)[:2]) == [0, 1]
    assert list(np.asarray(mask)) == [True, True, False]


def test_mutual_nearest_respects_mask2d():
    scores = jnp.array([[0.9, 0.95], [0.3, 0.99]])
    j, mask = mutual_nearest_matches(scores, thr=0.2,
                                     mask2d=jnp.array([True, False]))
    assert list(np.asarray(j)) == [0, 0]
    assert bool(mask[0]) and not bool(mask[1])


def test_gather_windows_values_and_padding():
    H, W, C = 6, 7, 2
    feat = jnp.arange(H * W * C, dtype=jnp.float32).reshape(H, W, C)
    centers = jnp.array([[0, 0], [3, 3]])
    patches, valid = gather_windows(feat, centers, 3)
    assert patches.shape == (2, 9, C)
    # corner window: top-left taps are out of bounds -> zero
    np.testing.assert_allclose(np.asarray(patches[0, 0]), 0.0)
    assert not bool(valid[0, 0])
    # center tap of second window == feat[3, 3]
    np.testing.assert_allclose(np.asarray(patches[1, 4]), np.asarray(feat[3, 3]))


def test_s2d_matching_and_loss():
    rng = jax.random.PRNGKey(0)
    N, M, C = 12, 20, 16
    d3 = jax.random.normal(rng, (N, C))
    d2 = jax.random.normal(jax.random.PRNGKey(1), (M, C))
    model = S2DMatching(row_tile=5)
    vars_ = model.init(jax.random.PRNGKey(2), d3, d2)
    conf = model.apply(vars_, d3, d2)
    assert conf.shape == (N, M)
    conf_gt = jnp.zeros((N, M)).at[jnp.arange(N), jnp.arange(N)].set(1.0)
    loss = coarse_loss(conf, conf_gt)
    assert np.isfinite(float(loss))
    # tiling must not change results vs an untiled pass
    model2 = S2DMatching(row_tile=12)
    conf2 = model2.apply(vars_, d3, d2)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2), atol=1e-5)


def test_fine_matching_peak_recovery():
    """If window features equal the 3D feature at one tap, expectation ~ there."""
    M, WW, C = 4, 49, 32
    rng = np.random.default_rng(0)
    f3 = rng.standard_normal((M, C)).astype(np.float32)
    f2 = rng.standard_normal((M, WW, C)).astype(np.float32) * 0.01
    peak = [0, 24, 48, 30]
    for m, p in enumerate(peak):
        f2[m, p] = f3[m] * 3.0
    model = FineMatching()
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(f3), jnp.asarray(f2))
    out = model.apply(vars_, jnp.asarray(f3), jnp.asarray(f2))
    assert out.shape == (M, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out[:, 2]) >= 0).all()  # std nonnegative


def test_fine_losses_masked():
    expec = jnp.array([[0.1, 0.0, 0.5], [2.0, 2.0, 0.5], [0.0, 0.1, 0.5]])
    gt = jnp.array([[0.0, 0.0], [0.5, 0.5], [0.0, 0.0]])
    mask = jnp.array([True, False, True])
    l1 = fine_loss_l2(expec, gt, mask)
    l2 = fine_loss_l2_std(expec, gt, mask)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # masked-out row 1 (large error) must not dominate
    assert float(l1) < 0.1


def test_self_cross_transformer_shapes_and_mask():
    model = SelfCrossTransformer(d_model=32, nhead=4, dim_feedforward=64)
    rng = jax.random.PRNGKey(0)
    v0 = jax.random.normal(rng, (1, 6, 32))
    v1 = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32))
    p0, p1 = jnp.zeros_like(v0), jnp.zeros_like(v1)
    vars_ = model.init(jax.random.PRNGKey(2), v0, p0, v1, p1)
    o0, o1 = model.apply(vars_, v0, p0, v1, p1)
    assert o0.shape == v0.shape and o1.shape == v1.shape
    # masking out tokens changes nothing for the kept tokens' validity
    m1 = jnp.array([[True] * 5 + [False] * 4])
    o0m, _ = model.apply(vars_, v0, p0, v1, p1, None, m1)
    assert np.isfinite(np.asarray(o0m)).all()
