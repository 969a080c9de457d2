"""Alternative coarse matchers (dual-softmax / sinkhorn) + new transforms
+ LLFF loader."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.models.coarse_matching_alt import (
    coarse_match_from_confidence,
    coarse_matching_loss,
    dual_softmax_confidence,
    sinkhorn_confidence,
)


def _paired_feats(rng, L=16, S=24, C=32):
    f1 = rng.standard_normal((S, C)).astype(np.float32)
    perm = rng.permutation(S)[:L]
    f0 = f1[perm] + 0.01 * rng.standard_normal((L, C)).astype(np.float32)
    return jnp.asarray(f0), jnp.asarray(f1), perm


def test_dual_softmax_recovers_permutation():
    rng = np.random.default_rng(0)
    f0, f1, perm = _paired_feats(rng)
    conf = dual_softmax_confidence(f0, f1)
    j, m = coarse_match_from_confidence(conf, thr=0.1)
    assert np.asarray(m).mean() > 0.9
    ok = np.asarray(j)[np.asarray(m)] == perm[np.asarray(m)]
    assert ok.mean() > 0.9


def test_sinkhorn_recovers_permutation():
    rng = np.random.default_rng(1)
    f0, f1, perm = _paired_feats(rng)
    conf = sinkhorn_confidence(f0 * 5, f1 * 5, jnp.asarray(1.0), iters=10)
    j, m = coarse_match_from_confidence(conf, thr=0.05)
    ok = np.asarray(j)[np.asarray(m)] == perm[np.asarray(m)]
    assert ok.mean() > 0.8


def test_coarse_matching_loss_decreases_for_better_conf():
    rng = np.random.default_rng(2)
    gt = jnp.zeros((8, 12)).at[jnp.arange(8), jnp.arange(8)].set(1.0)
    good = jnp.clip(gt * 0.9 + 0.05, 0.0, 1.0)
    bad = jnp.full((8, 12), 0.5)
    assert float(coarse_matching_loss(good, gt)) < \
        float(coarse_matching_loss(bad, gt))


def test_new_transforms():
    from nerfloc_tpu.data.transforms import DownSample, RandomCrop

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 96, 3), np.uint8)
    depth = rng.uniform(1, 3, (64, 96)).astype(np.float32)
    K = np.array([[80.0, 0, 48.0], [0, 80.0, 32.0], [0, 0, 1.0]])

    ds = DownSample(2.0)
    i2, d2, _, K2, _ = ds(img, depth, np.eye(4)[:3], K)
    assert i2.shape == (32, 48, 3)
    assert abs(K2[0, 0] - 40.0) < 1e-6

    rc = RandomCrop(0.5, 0.5)
    p = rc.sample_params(rng)
    i3, d3, _, K3, _ = rc(img, depth, np.eye(4)[:3], K, params=p)
    assert i3.shape == (32, 48, 3)
    # principal point shifted by the crop corner
    assert K3[0, 2] <= K[0, 2] and K3[1, 2] <= K[1, 2]


def test_llff_loader(tmp_path):
    import cv2

    from nerfloc_tpu.data.llff_scene import llff_scene_store

    scene_dir = os.path.join(str(tmp_path), "fern")
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    rng = np.random.default_rng(4)
    n = 12
    poses = np.zeros((n, 3, 5))
    H, W, focal = 48.0, 64.0, 50.0
    for i in range(n):
        # identity-ish LLFF pose [down right back | t | hwf]
        R_cv = np.eye(3)
        # invert the loader's convention mapping: columns [r d -b] -> llff
        poses[i, :, 0] = R_cv[:, 1]   # down
        poses[i, :, 1] = R_cv[:, 0]   # right
        poses[i, :, 2] = -R_cv[:, 2]  # back
        poses[i, :, 3] = [0.1 * i, 0, 0]
        poses[i, :, 4] = [H, W, focal]
        cv2.imwrite(os.path.join(scene_dir, "images", f"im_{i:03d}.png"),
                    rng.integers(0, 255, (int(H), int(W), 3), np.uint8))
    bounds = np.tile([2.0, 6.0], (n, 1))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.concatenate([poses.reshape(n, -1), bounds], axis=1))

    store = llff_scene_store(str(tmp_path), "fern", factor=4)
    assert len(store.test_frames) == 2   # every 8th of 12
    assert len(store.train_frames) == 10
    f = store.train_frames[0]
    assert f["near"] < f["far"]
    # recentred camera centers near origin on average
    centers = store.train_c2ws()[:, :3, 3]
    np.testing.assert_allclose(centers.mean(0), 0.0, atol=1e-6)
