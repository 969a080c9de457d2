"""Preprocessors, COLMAP IO, retrieval pipeline."""
import os
import pickle

import numpy as np
import pytest

from nerfloc_tpu.data.colmap_io import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    read_model,
    rotmat2qvec,
    write_model,
)
from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view
from nerfloc_tpu.retrieval.pipeline import (
    evaluate_retrieval,
    retrieve_top_k,
    retrieve_top_k_oracle,
)


def test_colmap_model_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cameras = {1: Camera(1, "PINHOLE", 640, 480,
                         np.array([500.0, 500.0, 320.0, 240.0]))}
    R = look_at_pose(np.zeros(3), np.array([0, 0, 1.0]))[:3, :3]
    images = {
        7: Image(7, rotmat2qvec(R), np.array([0.1, 0.2, 0.3]), 1,
                 "seq/frame0.png", rng.uniform(0, 640, (5, 2)),
                 np.array([0, 1, 2, -1, 4], np.int64)),
    }
    points = {
        3: Point3D(3, np.array([1.0, 2.0, 3.0]), np.array([255, 0, 10]),
                   0.5, np.array([7]), np.array([2])),
    }
    for ext in (".bin", ".txt"):
        d = str(tmp_path / ext.strip("."))
        write_model(d, cameras, images, points, ext=ext)
        c2, i2, p2 = read_model(d, ext=ext)
        np.testing.assert_allclose(c2[1].params, cameras[1].params)
        assert c2[1].model == "PINHOLE"
        np.testing.assert_allclose(i2[7].qvec, images[7].qvec, atol=1e-12)
        np.testing.assert_allclose(i2[7].tvec, images[7].tvec, atol=1e-12)
        assert i2[7].name == "seq/frame0.png"
        np.testing.assert_allclose(i2[7].xys, images[7].xys, atol=1e-9)
        np.testing.assert_array_equal(i2[7].point3D_ids, images[7].point3D_ids)
        np.testing.assert_allclose(p2[3].xyz, points[3].xyz)
        np.testing.assert_array_equal(p2[3].image_ids, points[3].image_ids)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        w = rng.standard_normal(3)
        angle = np.linalg.norm(w)
        axis = w / max(angle, 1e-9)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
        q = rotmat2qvec(R)
        np.testing.assert_allclose(qvec2rotmat(q), R, atol=1e-9)


def _write_7scenes(root, scene="chess", n_seq=2, n_frames=4):
    import cv2

    H, W = 96, 128
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    sd = os.path.join(root, scene)
    for s in range(1, n_seq + 1):
        seq_dir = os.path.join(sd, f"seq-{s:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        for i in range(n_frames):
            ang = 0.3 * s + 0.2 * i
            eye = np.array([0.3 * np.cos(ang), 0.05, 0.3 * np.sin(ang)])
            tgt = np.array([2 * np.cos(ang), 0, 2 * np.sin(ang)])
            c2w = look_at_pose(eye, tgt)
            rgb, depth = render_box_view(c2w, K, H, W)
            cv2.imwrite(os.path.join(seq_dir, f"frame-{i:06d}.color.png"),
                        cv2.cvtColor((rgb * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(seq_dir, f"frame-{i:06d}.depth.png"),
                        (depth * 1000).astype(np.uint16))
            np.savetxt(os.path.join(seq_dir, f"frame-{i:06d}.pose.txt"), c2w)
    with open(os.path.join(sd, "TrainSplit.txt"), "w") as fh:
        fh.write("sequence1\n")
    with open(os.path.join(sd, "TestSplit.txt"), "w") as fh:
        fh.write("sequence2\n")
    return sd


def test_preprocess_7scenes_end_to_end(tmp_path):
    import nerfloc_tpu.preprocess.seven_scenes as p7

    root = str(tmp_path)
    _write_7scenes(root)
    # synthetic scene uses its own intrinsics; patch the module constants
    old = (p7.FOCAL, p7.CX, p7.CY)
    p7.FOCAL, p7.CX, p7.CY = 0.9 * 128, 64.0, 48.0
    try:
        p7.process_scene(root, "chess", frame_stride=1, voxel_size=0.08)
    finally:
        p7.FOCAL, p7.CX, p7.CY = old

    sd = os.path.join(root, "chess")
    assert os.path.exists(os.path.join(sd, "info_train.pkl"))
    assert os.path.exists(os.path.join(sd, "pc.ply"))
    with open(os.path.join(sd, "info_train.pkl"), "rb") as fh:
        metas = pickle.load(fh)
    assert len(metas) == 4
    m = metas[0]
    assert m["extrinsic_Tcw"].shape == (3, 4)
    assert 0 < m["near"] < m["far"] < 10

    # the produced scene loads through the SceneStore
    from nerfloc_tpu.data.scene_store import SceneStore
    store = SceneStore.load(root, "chess")
    assert len(store.train_frames) == 4 and len(store.test_frames) == 4
    assert store.points is not None and len(store.points) > 100
    # pc.ply surface lies on the box (after recentring, offset is small)
    assert np.abs(store.points).max() < 2.7


def test_oracle_retrieval_and_recall():
    rng = np.random.default_rng(3)

    def pose_at(ang):
        T = np.eye(4)
        T[:3, :3] = look_at_pose(np.zeros(3), np.array(
            [np.cos(ang), 0, np.sin(ang)]))[:3, :3]
        T[:3, 3] = [np.cos(ang), 0, np.sin(ang)]
        return T

    db = {f"db{i}": pose_at(0.1 * i) for i in range(20)}
    q = {"q0": pose_at(0.05), "q1": pose_at(1.55)}
    top = retrieve_top_k_oracle(q, db, k=3)
    assert top["q0"][0] in ("db0", "db1")
    assert top["q1"][0] in ("db15", "db16")
    metrics = evaluate_retrieval(db, q, top, rot_thresh=30, trans_thresh=0.5)
    assert metrics["Avg-Recall@30_0.5_1"] == 1.0


def test_descriptor_retrieval_topk():
    rng = np.random.default_rng(4)
    d = rng.standard_normal((10, 16))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    names = [f"f{i}" for i in range(10)]
    top = retrieve_top_k(d, names, d, names, k=2, allow_self_match=False)
    # nearest non-self neighbor is never itself
    for n, lst in top.items():
        assert n not in lst
        assert len(lst) <= 2


def test_netvlad_shapes():
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.retrieval.netvlad import NetVLAD

    model = NetVLAD(num_clusters=4, out_dim=32)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32)
    n = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_onepose_box_filter():
    from nerfloc_tpu.preprocess.onepose import is_inside_box3d

    # unit cube corners in OnePose order (0 origin; 1,3,4 along edges)
    corners = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], dtype=np.float64)
    pts = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0, 0],
                    [0.99, 0.99, 0.99]])
    inside = is_inside_box3d(pts, corners)
    assert inside.tolist() == [True, False, False, True]
