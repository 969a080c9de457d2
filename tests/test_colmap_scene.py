"""COLMAP workspace -> SceneStore -> VideoDataset; sqlite db; transform extras."""
import os

import numpy as np
import pytest

from nerfloc_tpu.data.colmap_db import COLMAPDatabase, image_ids_to_pair_id, \
    pair_id_to_image_ids
from nerfloc_tpu.data.colmap_io import Camera, Image, Point3D, rotmat2qvec, \
    write_model
from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view


def _make_colmap_ws(root):
    import cv2

    H, W = 96, 128
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    cameras = {1: Camera(1, "PINHOLE", W, H,
                         np.array([f, f, W / 2, H / 2]))}
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.9, 1.9, (300, 3))
    points3D = {i: Point3D(i, pts[i], np.array([100, 120, 140]), 0.1,
                           np.zeros(0, np.int64), np.zeros(0, np.int64))
                for i in range(300)}

    images = {}
    os.makedirs(os.path.join(root, "images", "seq0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images", "seq1"), exist_ok=True)
    for i in range(8):
        seq = "seq0" if i < 6 else "seq1"
        ang = 0.25 * i
        eye = np.array([0.3 * np.cos(ang), 0.05, 0.3 * np.sin(ang)])
        tgt = np.array([2 * np.cos(ang), 0, 2 * np.sin(ang)])
        c2w = look_at_pose(eye, tgt)
        rgb, depth = render_box_view(c2w, K, H, W)
        name = f"{seq}/frame{i:04d}.jpg"
        cv2.imwrite(os.path.join(root, "images", name),
                    cv2.cvtColor((rgb * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        w2c = np.linalg.inv(c2w)
        images[i + 1] = Image(i + 1, rotmat2qvec(w2c[:3, :3]), w2c[:3, 3], 1,
                              name, np.zeros((0, 2)), np.zeros(0, np.int64))
    write_model(os.path.join(root, "sparse"), cameras, images, points3D)
    with open(os.path.join(root, "train.txt"), "w") as fh:
        fh.write("seq0\n")
    with open(os.path.join(root, "test.txt"), "w") as fh:
        fh.write("seq1\n")
    return root


def test_colmap_scene_store(tmp_path):
    from nerfloc_tpu.data.colmap_scene import colmap_scene_store
    from nerfloc_tpu.data.transforms import Compose, PadToSize, ResizeAndCrop
    from nerfloc_tpu.data.video_dataset import DataOptions, VideoDataset

    root = _make_colmap_ws(str(tmp_path))
    store = colmap_scene_store(root, depth_type="colmap")
    assert len(store.train_frames) == 6
    assert len(store.test_frames) == 2
    assert store.points is not None and len(store.points) == 300
    assert 0 < store.near < store.far

    tf = Compose([ResizeAndCrop(64, 16), PadToSize(64, 96)])
    ds = VideoDataset(store, "test", tf,
                      opts=DataOptions(n_views=3, max_points=128,
                                       support_image_selection="coreset",
                                       image_core_set_size=3))
    item = ds[0]
    assert item["image"].shape == (64, 96, 3)
    assert item["topk_images"].shape == (3, 64, 96, 3)
    # depth files don't exist -> zero depth, masked out downstream
    assert (item["topk_depths"] == 0).all()
    assert item["points3d"].shape == (128, 3)


def test_colmap_database_roundtrip(tmp_path):
    db = COLMAPDatabase.connect(str(tmp_path / "db.db"))
    db.create_tables()
    cam = db.add_camera(1, 640, 480, np.array([500.0, 500, 320, 240]))
    i1 = db.add_image("a.jpg", cam)
    i2 = db.add_image("b.jpg", cam)
    kps = np.random.default_rng(0).uniform(0, 640, (10, 2)).astype(np.float32)
    db.add_keypoints(i1, kps)
    matches = np.array([[0, 3], [1, 5], [2, 7]], np.uint32)
    db.add_matches(i2, i1, matches)  # reversed ids exercise the swap
    np.testing.assert_allclose(db.read_keypoints(i1), kps)
    got = db.read_matches(i2, i1)
    np.testing.assert_array_equal(got, matches)
    swapped = db.read_matches(i1, i2)
    np.testing.assert_array_equal(swapped, matches[:, ::-1])
    a, b = pair_id_to_image_ids(image_ids_to_pair_id(7, 3))
    assert (a, b) == (3, 7)


def test_transform_extras():
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.geometry.transforms_extra import (
        acos_linear_extrapolation,
        euler_angles_to_matrix,
        get_pose_perturb,
    )

    R = euler_angles_to_matrix(jnp.array([0.1, -0.2, 0.3]))
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-6

    T = get_pose_perturb(jax.random.PRNGKey(0), 0.01, 0.01)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(T[:3, :3] @ T[:3, :3].T),
                               np.eye(3), atol=1e-5)

    # finite gradient at the arccos boundary
    g = jax.grad(lambda x: acos_linear_extrapolation(x))(jnp.float32(1.0))
    assert np.isfinite(float(g))
    x = jnp.float32(0.5)
    np.testing.assert_allclose(float(acos_linear_extrapolation(x)),
                               float(jnp.arccos(x)), atol=1e-6)


def _write_pfm(path, data):
    data = np.flipud(np.asarray(data, np.float32))
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        data.astype("<f4").tofile(f)


def test_dtu_scene_store(tmp_path):
    """MVSNet rectified DTU layout -> SceneStore: cam.txt parsing (quarter-res
    intrinsics rescaled), holdout split, mm->unit rescale, pose-proximity
    retrieval, and depth/pose backprojection consistency."""
    import cv2

    from nerfloc_tpu.data.dtu_scene import dtu_scene_store
    from nerfloc_tpu.data.reader import load_frame

    H, W = 32, 40
    f = 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    base = str(tmp_path / "dtu")
    for sub in ("Cameras/train", "Rectified/scan1_train", "Depths/scan1_train"):
        os.makedirs(os.path.join(base, sub))
    n = 6
    for i in range(n):
        ang = 0.35 * i
        c2w = look_at_pose(np.array([0.3 * np.cos(ang), 0.1,
                                     0.3 * np.sin(ang)]),
                           np.array([2.0, 0, 0.0]))
        w2c = np.linalg.inv(c2w)
        rgb, depth = render_box_view(c2w, K, H, W)
        cv2.imwrite(os.path.join(base, "Rectified/scan1_train",
                                 f"rect_{i + 1:03d}_3_r5000.png"),
                    cv2.cvtColor((rgb * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        _write_pfm(os.path.join(base, "Depths/scan1_train",
                                f"depth_map_{i:04d}.pfm"), depth)
        ext = "\n".join(" ".join(f"{v:.8f}" for v in row) for row in w2c)
        intr = "\n".join(" ".join(f"{v:.8f}" for v in row) for row in K / 4.0)
        with open(os.path.join(base, "Cameras/train",
                               f"{i:08d}_cam.txt"), "w") as fh:
            fh.write(f"extrinsic\n{ext}\n\nintrinsic\n{intr}\n\n"
                     f"1.0 0.026 192 6.0\n")

    store = dtu_scene_store(base, "scan1", light="3", intrinsic_scale=4.0)
    assert len(store.test_frames) == 1 and len(store.train_frames) == n - 1
    # rescale: far = 6.0 * 1.1 -> 10 units
    assert abs(store.far - 10.0) < 1e-6
    s = store.scale_factor
    assert abs(s - 10.0 / 6.6) < 1e-6
    # pose-proximity retrieval attached
    assert all(len(fr["top_k"]) > 0 for fr in store.train_frames)
    # backprojection consistency after recenter+rescale (depth scaled like
    # video_dataset.py:238 does at item load)
    img, depth, Tcw, Kl = load_frame(store.base_dir, store.train_frames[0])
    assert img.shape == (H, W, 3)
    assert Kl[0, 0] == pytest.approx(f)  # quarter-res intrinsics rescaled
    vs, us = np.nonzero(depth > 0)
    z = depth[vs[::17], us[::17]] * s
    x = (us[::17] - Kl[0, 2]) / Kl[0, 0] * z
    y = (vs[::17] - Kl[1, 2]) / Kl[1, 1] * z
    pts_cam = np.stack([x, y, z], -1)
    T = np.eye(4); T[:3] = Tcw
    c2w = np.linalg.inv(T)
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    # the box (|coord| <= 2.5 pre-scale) recentred then scaled by s
    assert (np.abs(pts_w).max(axis=1) < 2.8 * s + 0.5).all()


def test_blender_scene_store(tmp_path):
    import cv2
    import json

    from nerfloc_tpu.data.blender_scene import blender_scene_store
    from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view

    H, W = 64, 64
    angle_x = 0.8
    f = 0.5 * W / np.tan(0.5 * angle_x)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    scene_dir = os.path.join(str(tmp_path), "lego")
    os.makedirs(os.path.join(scene_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "test"), exist_ok=True)
    gl2cv = np.diag([1.0, -1.0, -1.0, 1.0])
    for split, n in (("train", 4), ("test", 2)):
        frames = []
        for i in range(n):
            ang = 0.4 * i
            c2w = look_at_pose(np.array([0.2 * np.cos(ang), 0.0,
                                         0.2 * np.sin(ang)]),
                               np.array([2.0, 0, 0.0]))
            rgb, depth = render_box_view(c2w, K, H, W)
            rel = f"{split}/r_{i}"
            cv2.imwrite(os.path.join(scene_dir, rel + ".png"),
                        cv2.cvtColor((rgb * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            np.save(os.path.join(scene_dir, rel + "_depth.npy"), depth)
            # store the OpenGL-convention matrix, as blender does
            frames.append({"file_path": "./" + rel,
                           "transform_matrix": (c2w @ gl2cv).tolist()})
        with open(os.path.join(scene_dir, f"transforms_{split}.json"),
                  "w") as fh:
            json.dump({"camera_angle_x": angle_x, "frames": frames}, fh)

    store = blender_scene_store(str(tmp_path), "lego", near=0.5, far=7.0)
    assert len(store.train_frames) == 4 and len(store.test_frames) == 2
    # poses converted back to OpenCV: backprojecting depth lands on the box
    from nerfloc_tpu.data.reader import load_frame
    img, depth, Tcw, Kl = load_frame(store.base_dir, store.train_frames[0])
    assert img.shape == (H, W, 3)
    vs, us = np.nonzero(depth > 0)
    z = depth[vs[::37], us[::37]]
    x = (us[::37] - Kl[0, 2]) / Kl[0, 0] * z
    y = (vs[::37] - Kl[1, 2]) / Kl[1, 1] * z
    pts_cam = np.stack([x, y, z], -1)
    T = np.eye(4); T[:3] = Tcw
    pts_w = pts_cam @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3]
    assert (np.abs(pts_w).max(axis=1) < 2.6).all()
