import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.ops import bilinear_sample, bilinear_sample_views, knn, knn_gather


def brute_knn(q, p, k, mask=None):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d = np.where(mask[None, :], d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((257, 3)).astype(np.float32)
    p = rng.standard_normal((1003, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(p), K=8, tile=256)
    bd, bi = brute_knn(q, p, 8)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-3, atol=1e-4)
    # indices can differ on ties; compare distances gathered at returned idx
    dd = ((q[:, None, :] - p[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(dd, bd, rtol=1e-3, atol=1e-4)


def test_knn_masked():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    p = rng.standard_normal((500, 3)).astype(np.float32)
    mask = rng.uniform(size=500) > 0.5
    d, i = knn(jnp.asarray(q), jnp.asarray(p), K=4, points_mask=jnp.asarray(mask), tile=128)
    assert mask[np.asarray(i)].all()
    bd, _ = brute_knn(q, p, 4, mask)
    np.testing.assert_allclose(np.asarray(d), bd, rtol=1e-3, atol=1e-4)


def test_knn_k1_and_gather():
    rng = np.random.default_rng(2)
    p = rng.standard_normal((100, 3)).astype(np.float32)
    q = p[17:19] + 1e-5
    d, i = knn(jnp.asarray(q), jnp.asarray(p), K=1)
    assert list(np.asarray(i[:, 0])) == [17, 18]
    feats = jnp.asarray(rng.standard_normal((100, 7)).astype(np.float32))
    g = knn_gather(feats, i)
    np.testing.assert_allclose(np.asarray(g[0, 0]), np.asarray(feats[17]))


def test_knn_grad_flows():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))

    def loss(q):
        d, _ = knn(q, p, K=2)
        return d.sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def _torch_grid_sample(feat_hwc, uv, H, W, padding_mode):
    import torch

    f = torch.tensor(feat_hwc).permute(2, 0, 1)[None]  # 1,C,H,W
    norm = np.stack([2 * uv[:, 0] / (W - 1) - 1, 2 * uv[:, 1] / (H - 1) - 1], -1)
    grid = torch.tensor(norm, dtype=torch.float32)[None, :, None, :]  # 1,N,1,2
    out = torch.nn.functional.grid_sample(
        f, grid, align_corners=True, padding_mode=padding_mode
    )
    return out[0, :, :, 0].T.numpy()  # N,C


def test_bilinear_matches_torch_border():
    rng = np.random.default_rng(4)
    H, W, C = 13, 17, 5
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(-2, W + 1, 200), rng.uniform(-2, H + 1, 200)], -1
    ).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(uv)))
    ref = _torch_grid_sample(feat, uv, H, W, "border")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_zeros_mode_outside():
    feat = jnp.ones((4, 4, 2))
    uv = jnp.array([[-1.0, 0.0], [1.5, 1.5], [5.0, 2.0]])
    out = bilinear_sample(feat, uv, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[1]), 1.0)
    np.testing.assert_allclose(np.asarray(out[2]), 0.0)


def test_bilinear_views_vmap():
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((3, 8, 8, 4)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 7, size=(3, 10, 2)).astype(np.float32))
    out = bilinear_sample_views(feats, uv)
    assert out.shape == (3, 10, 4)
    one = bilinear_sample(feats[1], uv[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one), atol=1e-6)


def _synthetic_ray_scene(seed=6, R=32, S=16, M=2000):
    """Depth-coherent cloud (a noisy surface in front of the camera) plus
    camera rays through it — the geometry knn_rays is built for."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-2, 2, M),
        rng.uniform(-2, 2, M),
        rng.uniform(1.0, 5.0, M),
    ], -1).astype(np.float32)
    rays_o = np.zeros((R, 3), np.float32) + rng.normal(0, 0.05, (R, 3)).astype(np.float32)
    dirs = np.stack([
        rng.uniform(-0.4, 0.4, R), rng.uniform(-0.4, 0.4, R), np.ones(R)
    ], -1).astype(np.float32)
    z = np.linspace(1.0, 5.0, S, dtype=np.float32)
    z_vals = np.broadcast_to(z, (R, S)).copy()
    return rays_o, dirs, z_vals, pts


def test_knn_rays_recall():
    """Candidate recall vs exact KNN, both selection dtypes: the default
    exact f32 selection >= 0.995; the bf16 selection the render path opts
    into (3.3x faster on TPU,
    rank noise at the candidate boundary only) >= 0.98 — the lost neighbors
    are overwhelmingly the farthest of K=8, whose 1/dist aggregation weight
    is minimal (render-closeness guarded by
    tests/test_fields.py::test_render_ray_knn_pruned_close)."""
    from nerfloc_tpu.ops import knn_rays

    rays_o, rays_d, z_vals, pts = _synthetic_ray_scene()
    R, S = z_vals.shape
    samples = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    _, exact = brute_knn(samples.reshape(-1, 3), pts, 8)
    exact = exact.reshape(R, S, 8)
    for sd, floor in ((jnp.float32, 0.995), (jnp.bfloat16, 0.98)):
        idx = np.asarray(knn_rays(jnp.asarray(rays_o), jnp.asarray(rays_d),
                                  jnp.asarray(z_vals), jnp.asarray(pts), K=8,
                                  n_candidates=128, tile=512,
                                  selection_dtype=sd))
        recall = np.mean([
            len(set(idx[r, s]) & set(exact[r, s])) / 8.0
            for r in range(R) for s in range(S)
        ])
        assert recall >= floor, f"knn_rays {sd.__name__} recall {recall:.4f}"


def test_knn_rays_masked():
    from nerfloc_tpu.ops import knn_rays

    rays_o, rays_d, z_vals, pts = _synthetic_ray_scene(seed=7, M=800)
    rng = np.random.default_rng(8)
    mask = rng.uniform(size=800) > 0.4
    idx = np.asarray(knn_rays(jnp.asarray(rays_o), jnp.asarray(rays_d),
                              jnp.asarray(z_vals), jnp.asarray(pts), K=4,
                              points_mask=jnp.asarray(mask),
                              n_candidates=48, tile=256))
    assert mask[idx].all(), "knn_rays returned masked points"


def test_knn_rays_nonunit_dirs():
    """The closed form must hold for non-normalized ray directions (pixel
    rays through K are not unit length)."""
    from nerfloc_tpu.ops import knn_rays

    rays_o, rays_d, z_vals, pts = _synthetic_ray_scene(seed=9, R=8, S=8, M=500)
    scale = np.linspace(0.5, 2.0, 8, dtype=np.float32)[:, None]
    idx1 = np.asarray(knn_rays(jnp.asarray(rays_o), jnp.asarray(rays_d * scale),
                               jnp.asarray(z_vals / scale), jnp.asarray(pts),
                               K=4, n_candidates=64, tile=256))
    samples = rays_o[:, None, :] + (rays_d * scale)[:, None, :] * (z_vals / scale)[..., None]
    _, exact = brute_knn(samples.reshape(-1, 3), pts, 4)
    exact = exact.reshape(8, 8, 4)
    recall = np.mean([
        len(set(idx1[r, s]) & set(exact[r, s])) / 4.0
        for r in range(8) for s in range(8)
    ])
    assert recall >= 0.99, f"non-unit dirs recall {recall:.4f}"


def test_packed_bilinear_matches_bilinear_sample():
    """pack_bilinear_corners + packed_bilinear_sample_views == the border-mode
    bilinear_sample it replaces in the render hot loop."""
    from nerfloc_tpu.ops.interp import (
        bilinear_sample,
        pack_bilinear_corners,
        packed_bilinear_sample_views,
    )

    rng = np.random.default_rng(11)
    V, H, W, C = 3, 12, 16, 40
    feats = jnp.asarray(rng.standard_normal((V, H, W, C)), jnp.float32)
    # include out-of-bounds + exact-border coords
    uv = jnp.asarray(
        rng.uniform(-2.0, 2.0, (V, 200, 2)) * np.array([W, H]) -
        np.array([1.0, 1.0]), jnp.float32)

    packed = pack_bilinear_corners(feats)
    got = packed_bilinear_sample_views(packed, H, W, uv)
    want = jax.vmap(lambda f, p: bilinear_sample(f, p))(feats, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_bilinear_bf16_table_f32_weights():
    """The production hot path packs tables in bf16; sub-pixel weights must
    stay f32 (bf16 du/dv quantize to ~2^-9). Pin it with a case where weight
    precision is the ONLY error source: a bf16-exact +/-1 checker along u,
    sampled at du = 0.5 + delta. Exact blend = -2*delta (tiny, so the bf16
    OUTPUT cast is relatively precise there); bf16 du would round to the
    2^-9 grid near 0.5 and err by up to ~2^-8 absolute."""
    from nerfloc_tpu.ops.interp import (
        pack_bilinear_corners,
        packed_bilinear_sample_views,
    )

    V, H, W, C = 1, 4, 16, 8
    x = np.arange(W)
    feats = np.broadcast_to(((-1.0) ** x)[None, None, :, None],
                            (V, H, W, C)).astype(np.float32)
    deltas = np.linspace(-(2 ** -10), 2 ** -10, 64).astype(np.float32)
    u = 6.0 + 0.5 + deltas
    uv = jnp.asarray(np.stack([u, np.full_like(u, 2.0)], -1)[None], jnp.float32)

    packed16 = pack_bilinear_corners(jnp.asarray(feats)).astype(jnp.bfloat16)
    got = np.asarray(packed_bilinear_sample_views(packed16, H, W, uv),
                     np.float32)
    want = (-2.0 * deltas)[None, :, None]
    err = np.max(np.abs(got - want))
    assert err < 2 ** -12, f"sub-pixel weight quantization err {err:.2e}"


def test_bilinear_mm_grad_matches_plain():
    """bilinear_sample_mm_grad: identical forward, MXU-matmul feature
    gradient identical to the scatter transpose of the plain sampler,
    zero uv cotangent by contract (ops/interp.py)."""
    from nerfloc_tpu.ops.interp import bilinear_sample_mm_grad

    rng = np.random.RandomState(0)
    H, W, C = 13, 17, 40
    feat = jnp.asarray(rng.randn(H, W, C), jnp.float32)
    uv = jnp.asarray(np.concatenate([
        rng.rand(300, 2) * [W - 1, H - 1],
        np.array([[0, 0], [W - 1, H - 1], [-3.2, 4.0],
                  [W + 5.0, H + 2.0], [0.5, -0.5]]),
    ]), jnp.float32)
    y0 = bilinear_sample(feat, uv, padding_mode="border")
    y1 = bilinear_sample_mm_grad(feat, uv)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    w = jnp.asarray(rng.randn(uv.shape[0], C), jnp.float32)
    g0 = jax.grad(lambda f: jnp.sum(
        bilinear_sample(f, uv, padding_mode="border") * w))(feat)
    g1 = jax.grad(lambda f: jnp.sum(
        bilinear_sample_mm_grad(f, uv) * w))(feat)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-4)
    gu = jax.grad(lambda u: jnp.sum(
        bilinear_sample_mm_grad(feat, u) * w))(uv)
    assert float(jnp.max(jnp.abs(gu))) == 0.0

    # vmapped over views (the aggregator's usage shape)
    fv = jnp.asarray(rng.randn(3, H, W, C), jnp.float32)
    uvv = jnp.asarray(rng.rand(3, 77, 2) * [W - 1, H - 1], jnp.float32)
    wv = jnp.asarray(rng.randn(3, 77, C), jnp.float32)
    gv0 = jax.grad(lambda f: jnp.sum(jax.vmap(
        lambda a, b: bilinear_sample(a, b, padding_mode="border"))(
            f, uvv) * wv))(fv)
    gv1 = jax.grad(lambda f: jnp.sum(jax.vmap(
        bilinear_sample_mm_grad)(f, uvv) * wv))(fv)
    np.testing.assert_allclose(np.asarray(gv0), np.asarray(gv1),
                               rtol=1e-4, atol=1e-4)
