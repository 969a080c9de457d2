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
