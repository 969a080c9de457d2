"""Data layer: on-disk scene contract -> static-shape batch round-trip.

Builds a synthetic scene on disk in the preprocessors' format
(info_{split}.pkl + retrieval pkl + pc.ply + png/16-bit depth), then checks
the SceneStore / VideoDataset / factory pipeline end to end.
"""
import os
import pickle

import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig
from nerfloc_tpu.data.ply import read_ply_points, write_ply_points
from nerfloc_tpu.data.samplers import CovisibilitySampler, fps_poses
from nerfloc_tpu.data.scene_store import SceneStore
from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view
from nerfloc_tpu.data.transforms import (
    ColorJitter,
    Compose,
    PadToSize,
    RandomRotate,
    RandomZoom,
    ResizeAndCrop,
)
from nerfloc_tpu.data.video_dataset import DataOptions, VideoDataset


H0, W0 = 96, 128


def _write_scene(root, scene="box", n_train=6, n_test=2):
    import cv2

    sd = os.path.join(root, scene)
    os.makedirs(sd, exist_ok=True)
    f = 0.9 * W0
    K = np.array([[f, 0, W0 / 2], [0, f, H0 / 2], [0, 0, 1]])

    def make_frames(n, split, angle0):
        frames = []
        for i in range(n):
            ang = angle0 + 0.25 * i
            eye = np.array([0.3 * np.cos(ang), 0.05, 0.3 * np.sin(ang)])
            tgt = np.array([2.0 * np.cos(ang), 0.0, 2.0 * np.sin(ang)])
            c2w = look_at_pose(eye, tgt)
            rgb, depth = render_box_view(c2w, K, H0, W0)
            img_name = f"{scene}/seq0/{split}_frame{i}.png"
            dep_name = f"{scene}/seq0/{split}_frame{i}.depth.png"
            os.makedirs(os.path.join(sd, "seq0"), exist_ok=True)
            cv2.imwrite(os.path.join(root, img_name),
                        cv2.cvtColor((rgb * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(root, dep_name),
                        (depth * 1000).astype(np.uint16))
            Tcw = np.linalg.inv(c2w)[:3]
            frames.append({
                "file_name": img_name,
                "depth_file_name": dep_name,
                "extrinsic_Tcw": Tcw,
                "camera_intrinsic": K,
                "near": 0.5,
                "far": 7.0,
                "sequence_id": "seq0",
                "frame_id": i,
            })
        return frames

    train = make_frames(n_train, "train", 0.0)
    test = make_frames(n_test, "test", 0.1)
    with open(os.path.join(sd, "info_train.pkl"), "wb") as fh:
        pickle.dump(train, fh)
    with open(os.path.join(sd, "info_test.pkl"), "wb") as fh:
        pickle.dump(test, fh)
    retrieval = {fr["file_name"]: [t["file_name"] for t in train[:4]]
                 for fr in test + train}
    for split in ("train", "test"):
        with open(os.path.join(sd, f"image_retrieval_{split}_netvlad.pkl"),
                  "wb") as fh:
            pickle.dump(retrieval, fh)

    pts = np.random.default_rng(0).uniform(-2, 2, (500, 3)).astype(np.float32)
    write_ply_points(os.path.join(sd, "pc.ply"), pts,
                     np.random.default_rng(1).uniform(0, 1, (500, 3)))
    return sd


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scenes"))
    _write_scene(root)
    return root


def test_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(2).standard_normal((100, 3)).astype(np.float32)
    rgb = np.random.default_rng(3).uniform(0, 1, (100, 3)).astype(np.float32)
    p = str(tmp_path / "x.ply")
    write_ply_points(p, xyz, rgb)
    xyz2, rgb2 = read_ply_points(p)
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_allclose(rgb2, rgb, atol=1 / 255.0 + 1e-6)


def test_scene_store_recenter_rescale(scene_dir):
    store = SceneStore.load(scene_dir, "box", scale_factor=2.0)
    # recentring: mean training camera center ~ 0
    centers = store.train_c2ws()[:, :3, 3]
    np.testing.assert_allclose(centers.mean(0), 0.0, atol=1e-6)
    assert store.scale_factor == 2.0
    assert abs(store.far - 14.0) < 1e-6  # 7.0 * 2
    assert store.points is not None and store.points.shape[1] == 3


def test_video_dataset_item_contract(scene_dir):
    store = SceneStore.load(scene_dir, "box")
    tf = Compose([ResizeAndCrop(64, 16), PadToSize(64, 96)])
    ds = VideoDataset(store, "test", tf, opts=DataOptions(n_views=3,
                                                          max_points=256))
    item = ds[0]
    assert item["image"].shape == (64, 96, 3)
    assert item["depth"].shape == (64, 96)
    assert item["topk_images"].shape == (3, 64, 96, 3)
    assert item["topk_depths"].shape == (3, 64, 96)
    assert item["topk_poses"].shape == (3, 4, 4)
    assert item["topk_Ks"].shape == (3, 3, 3)
    assert item["points3d"].shape == (256, 3)
    assert item["points3d_mask"].shape == (256,)
    assert item["pose"].shape == (4, 4)
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    # support depths outside [near, far] zeroed
    d = item["topk_depths"]
    assert ((d == 0) | ((d > item["near"]) & (d < item["far"]))).all()
    # padded image rows (64 real -> none here since 64x96 crop of 64x85?) --
    # at minimum depth of padded columns must be zero
    assert np.isfinite(item["depth"]).all()


def test_video_dataset_depth_consistency(scene_dir):
    """Backprojecting a support depth map with its pose/K must land on the
    box surface (geometry consistency through ResizeAndCrop + padding)."""
    store = SceneStore.load(scene_dir, "box")
    tf = Compose([ResizeAndCrop(64, 16), PadToSize(64, 96)])
    ds = VideoDataset(store, "test", tf, opts=DataOptions(n_views=2))
    item = ds[0]
    d = item["topk_depths"][0]
    K = item["topk_Ks"][0]
    c2w = item["topk_poses"][0]
    vs, us = np.nonzero(d > 0)
    sel = slice(0, len(vs), 17)
    us, vs = us[sel], vs[sel]
    z = d[vs, us]
    x = (us - K[0, 2]) / K[0, 0] * z
    y = (vs - K[1, 2]) / K[1, 1] * z
    pts_cam = np.stack([x, y, z], -1)
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    # recentered box: recenter shift is small (cameras near origin), box
    # half-extent 2.0 -> max |coord| should be ~2 + shift
    m = np.abs(pts_w).max(axis=1)
    assert (m < 2.6).all()
    assert (m > 1.2).mean() > 0.9  # most points on the box walls


def test_transforms_geometry_consistency():
    """RandomRotate must rotate image and premultiply Tcw consistently:
    reprojecting a depth pixel through the updated (K, Tcw) lands on the
    same world point as the original."""
    rng = np.random.default_rng(5)
    f = 80.0
    K = np.array([[f, 0, 48.0], [0, f, 32.0], [0, 0, 1.0]])
    c2w = look_at_pose(np.array([0.2, 0.1, 0.2]), np.array([1.5, 0, 1.5]))
    rgb, depth = render_box_view(c2w, K, 64, 96)
    img = (rgb * 255).astype(np.uint8)
    Tcw = np.linalg.inv(c2w)[:3]

    rot = RandomRotate(30.0)
    params = {"angle": 20.0}
    img2, depth2, Tcw2, K2, _ = rot(img, depth, Tcw.copy(), K.copy(),
                                    params=params)
    # backproject center pixel of rotated frame
    v, u = 32, 48
    z = depth2[v, u]
    if z > 0:
        p_cam = np.array([(u - K2[0, 2]) / K2[0, 0] * z,
                          (v - K2[1, 2]) / K2[1, 1] * z, z])
        T2 = np.eye(4)
        T2[:3] = Tcw2
        p_w = (np.linalg.inv(T2) @ np.append(p_cam, 1.0))[:3]
        # must lie on the box surface (|max coord| ~ 2)
        assert abs(np.abs(p_w).max() - 2.0) < 0.15


def test_random_zoom_updates_K():
    img = np.zeros((64, 96, 3), np.uint8)
    depth = np.ones((64, 96), np.float32)
    K = np.array([[80.0, 0, 48.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    Tcw = np.eye(4)[:3]
    z = RandomZoom(0.5, 2.0)
    img2, depth2, _, K2, _ = z(img, depth, Tcw, K, params={"scale": 0.5})
    assert img2.shape == img.shape
    assert abs(K2[0, 0] - 40.0) < 1e-6
    img3, _, _, K3, _ = z(img, depth, Tcw, K, params={"scale": 2.0})
    assert abs(K3[0, 0] - 160.0) < 1e-6


def test_color_jitter_changes_image_only():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    depth = rng.uniform(size=(32, 32)).astype(np.float32)
    K = np.eye(3)
    cj = ColorJitter(0.4, 0.4, 0.4, 0.1)
    p = cj.sample_params(rng)
    img2, depth2, _, K2, _ = cj(img, depth, np.eye(4)[:3], K, params=p)
    assert img2.shape == img.shape
    assert (depth2 == depth).all()
    assert (K2 == K).all()


def test_fps_sampler_spreads():
    angles = np.linspace(0, np.pi, 16)
    c2ws = []
    for a in angles:
        T = np.eye(4)
        T[:3, :3] = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                              [-np.sin(a), 0, np.cos(a)]])
        c2ws.append(T)
    c2ws = np.stack(c2ws)
    idx = fps_poses(c2ws, 4, init_idx=0)
    assert len(set(idx.tolist())) == 4
    assert 15 in idx  # farthest rotation must be chosen


def test_covisibility_sampler_covers():
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1, 1, (200, 3)) + np.array([0, 0, 4.0])
    K = np.array([[50.0, 0, 32.0], [0, 50.0, 32.0], [0, 0, 1.0]])
    w2cs, Ks = [], []
    # camera 0 sees everything; cameras 1..4 see little (looking away)
    w2cs.append(np.eye(4))
    for i in range(4):
        T = np.eye(4)
        T[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
        T[2, 3] = -10.0 - i
        w2cs.append(T)
    Ks = np.stack([K] * 5)
    s = CovisibilitySampler(pts, np.stack(w2cs), Ks, image_hw=(64, 64))
    chosen = s.sample(2)
    assert chosen[0] == 0  # max coverage first
