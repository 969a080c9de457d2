"""Test-time robustness harnesses, profiling utils, retrieval registry."""
import numpy as np
import pytest


def test_profiling_phase_timer():
    import time

    from nerfloc_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert "a" in t.report() and "b" in t.report()


def test_retrieval_registry():
    from nerfloc_tpu.retrieval import get_retrieval_model

    m = get_retrieval_model("netvlad")
    assert m is not None
    with pytest.raises(KeyError):
        get_retrieval_model("no_such_method")


def test_test_time_color_jitter_deterministic(tmp_path):
    """Same frame -> same jitter params (hash-table selection)."""
    import sys

    sys.path.insert(0, "tests")
    from test_data import _write_scene

    from nerfloc_tpu.data.scene_store import SceneStore
    from nerfloc_tpu.data.transforms import Compose, PadToSize, ResizeAndCrop
    from nerfloc_tpu.data.video_dataset import DataOptions, VideoDataset

    root = str(tmp_path)
    _write_scene(root, scene="box", n_train=4, n_test=2)
    store = SceneStore.load(root, "box")
    tf = Compose([ResizeAndCrop(64, 16), PadToSize(64, 96)])
    ds = VideoDataset(store, "test", tf, opts=DataOptions(n_views=2),
                      test_time_color_jitter=True)
    a = ds[0]["image"]
    b = ds[0]["image"]
    np.testing.assert_allclose(a, b)  # reproducible
    ds_plain = VideoDataset(store, "test", tf, opts=DataOptions(n_views=2))
    c = ds_plain[0]["image"]
    assert np.abs(a - c).max() > 1e-3  # jitter actually applied


def test_colorize_depth_range():
    from nerfloc_tpu.utils.common import colorize_depth

    d = np.linspace(1.0, 5.0, 64).reshape(8, 8)
    rgb = colorize_depth(d)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    mask = np.zeros((8, 8), bool)
    mask[:4] = True
    rgb2 = colorize_depth(d, mask)
    assert (rgb2[4:] == 0).all()


def test_batch_loader_prefetch(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_data import _write_scene

    from nerfloc_tpu.data.prefetch import BatchLoader
    from nerfloc_tpu.data.scene_store import SceneStore
    from nerfloc_tpu.data.transforms import Compose, PadToSize, ResizeAndCrop
    from nerfloc_tpu.data.video_dataset import DataOptions, VideoDataset

    root = str(tmp_path)
    _write_scene(root, scene="box", n_train=6, n_test=5)
    store = SceneStore.load(root, "box")
    tf = Compose([ResizeAndCrop(64, 16), PadToSize(64, 96)])
    ds = VideoDataset(store, "test", tf, opts=DataOptions(n_views=2))
    loader = BatchLoader(ds, batch_size=2, num_workers=3, seed=1)
    assert len(loader) == 2  # 5 items, drop_last
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 96, 3)
    assert batches[0]["topk_images"].shape == (2, 2, 64, 96, 3)
    # different epoch -> different shuffle order is permitted but shapes hold
    b2 = list(loader.epoch(1))
    assert len(b2) == 2


def test_gem_descriptor_shapes():
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.retrieval.gem import GeMDescriptor

    m = GeMDescriptor(out_dim=64, blocks=(1, 1, 1, 1))
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                               1.0, atol=1e-4)


def test_retrieval_strip_vis(tmp_path):
    import os
    import sys

    sys.path.insert(0, "tests")
    from test_data import _write_scene

    from nerfloc_tpu.retrieval.vis import save_retrieval_strips

    root = str(tmp_path)
    _write_scene(root, scene="box", n_train=4, n_test=2)
    import pickle
    with open(os.path.join(root, "box", "image_retrieval_test_netvlad.pkl"),
              "rb") as f:
        top_k = pickle.load(f)
    out = os.path.join(root, "vis")
    save_retrieval_strips(root, top_k, out, max_queries=2)
    assert len(os.listdir(out)) >= 1


def test_run_scene_retrieval_netvlad_end_to_end(tmp_path):
    """Descriptor-based retrieval through the registry (random-init NetVLAD
    still produces valid pkls + metrics)."""
    import os
    import pickle
    import sys

    sys.path.insert(0, "tests")
    from test_data import _write_scene

    from nerfloc_tpu.data.scene_store import SceneStore
    from nerfloc_tpu.retrieval.pipeline import run_scene_retrieval

    root = str(tmp_path)
    _write_scene(root, scene="box", n_train=4, n_test=2)
    store = SceneStore.load(root, "box")
    m = run_scene_retrieval(store, "netvlad", k=2)
    assert "Avg-Recall@30.0_0.5_1" in m
    p = os.path.join(root, "box", "image_retrieval_test_netvlad.pkl")
    with open(p, "rb") as f:
        table = pickle.load(f)
    assert len(table) == 2
    for q, lst in table.items():
        assert 1 <= len(lst) <= 2
        assert q not in lst


def test_batched_backbone_pass_matches_separate_calls():
    """build_context's single [1+V]-image backbone pass must be numerically
    equivalent to the two separate extract_2d calls it replaced (per-image
    convs are batch-independent; frozen BN uses running stats). XLA may
    pick a different conv algorithm per batch size, so equality is to
    float reassociation tolerance, not bitwise."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

    cfg = Config(
        backbone2d_fpn_dim=16, model_3d_hidden_dim=16, matcher_hidden_dim=24,
        n_views_train=2,
        render=RenderConfig(N_samples=4, N_rand=8),
        matching=MatchingConfig(fine_num_3d_keypoints=16,
                                coarse_num_3d_keypoints=16),
        shapes=dataclasses.replace(Config().shapes, pnp_hypotheses=32),
    )
    model = NerfPoseEstimator(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=2, H=32, W=32,
                                           seed=3)).items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, batch, rng)

    def merged(m):
        a2d = m.extract_2d(jnp.concatenate(
            [batch["image"][None], batch["topk_images"]], axis=0))
        return m._slice_2d(a2d, 0, 1), m._slice_2d(a2d, 1, None)

    def separate(m):
        return (m.extract_2d(batch["image"][None]),
                m.extract_2d(batch["topk_images"]))

    qm, sm = model.apply(params, method=merged)
    qs, ss = model.apply(params, method=separate)
    for got, want in ((qm, qs), (sm, ss)):
        assert got["stride_coarse"] == want["stride_coarse"]
        for k in ("feat_coarse", "feat_fine"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-4, atol=1e-5)
