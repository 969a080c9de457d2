"""Image-retrieval pipeline: descriptors/oracle -> top-k pkl -> recall eval.

Rebuild of the reference pipeline (reference: nerf_loc/models/image_retrieval/
run.py:60-298): per scene, retrieve the top-k training frames for every
train/test frame and dump `image_retrieval_{split}_{method}.pkl`
({query file_name: [db file_names]}), the input contract of the dataset
layer. 'oracle' ranks by pose distance (rotation angle + translation);
'netvlad' ranks by descriptor cosine similarity.

CLI: python -m nerfloc_tpu.retrieval.pipeline --config <yaml>
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np


def retrieve_top_k(query_desc: np.ndarray, query_names: List[str],
                   db_desc: np.ndarray, db_names: List[str], k: int,
                   allow_self_match: bool = False,
                   interval: int = 1) -> Dict[str, List[str]]:
    """Cosine-similarity top-k (run.py:63-80). Descriptors are L2-normalized
    so the dot product is the cosine score; min_score=0 filter preserved."""
    db_desc = db_desc[::interval]
    db_names = list(db_names)[::interval]
    sim = query_desc @ db_desc.T  # [Q, D]
    if not allow_self_match:
        same = np.asarray(query_names)[:, None] == np.asarray(db_names)[None]
        sim = np.where(same, -np.inf, sim)
    k = min(k, sim.shape[1])
    idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
    out = {}
    for qi, name in enumerate(query_names):
        cand = idx[qi]
        cand = cand[np.argsort(-sim[qi, cand])]
        out[name] = [db_names[j] for j in cand if sim[qi, j] > 0]
    return out


def pose_distance(T_query: np.ndarray, T_db: np.ndarray,
                  rot_weight: float = 1.0):
    """Combined rotation-angle (rad) + translation distance used by the
    oracle retrieval (run.py:118-196 get_nearest_pose_ids 'matrix' mode)."""
    R1 = T_query[None, :3, :3]
    R2 = T_db[:, :3, :3]
    tr = np.trace(np.matmul(R2.transpose(0, 2, 1), R1), axis1=1, axis2=2)
    rot = np.arccos(np.clip((tr - 1) / 2.0, -1 + 1e-8, 1 - 1e-8))
    trans = np.linalg.norm(T_db[:, :3, 3] - T_query[None, :3, 3], axis=1)
    return rot_weight * rot + trans


def retrieve_top_k_oracle(query_poses: Dict[str, np.ndarray],
                          db_poses: Dict[str, np.ndarray], k: int,
                          allow_self_match: bool = False,
                          interval: int = 1) -> Dict[str, List[str]]:
    """GT-pose-based retrieval (run.py oracle mode)."""
    db_names = list(db_poses.keys())[::interval]
    T_db = np.stack([db_poses[n] for n in db_names])
    out = {}
    for name, T_q in query_poses.items():
        d = pose_distance(T_q, T_db)
        if not allow_self_match:
            d = np.where(np.asarray(db_names) == name, np.inf, d)
        order = np.argsort(d)[:k]
        out[name] = [db_names[j] for j in order]
    return out


def evaluate_retrieval(db_poses: Dict[str, np.ndarray],
                       query_poses: Dict[str, np.ndarray],
                       top_k: Dict[str, List[str]], rot_thresh: float = 30.0,
                       trans_thresh: float = 0.5, max_k: int = 5) -> Dict:
    """Recall@thresholds (run.py:207-229): a retrieval is correct when the
    db pose is within (rot_thresh deg, trans_thresh m) of the query pose."""
    correct = []
    for name, db_names in top_k.items():
        T_q = query_poses[name]
        cnt = 0
        for db_name in db_names[:max_k + 1]:
            T_d = db_poses[db_name]
            rel = T_d[:3, :3].T @ T_q[:3, :3]
            rot = np.degrees(np.arccos(
                np.clip((np.trace(rel) - 1) / 2.0, -1.0, 1.0)))
            trans = np.linalg.norm(T_q[:3, 3] - T_d[:3, 3])
            cnt += int(rot < rot_thresh and trans < trans_thresh)
        correct.append(cnt)
    correct = np.asarray(correct)
    return {f"Avg-Recall@{rot_thresh}_{trans_thresh}_{n}":
            float((correct >= n).mean()) for n in (1, 2)}


def extract_descriptors(frames, base_dir: str, method: str = "netvlad",
                        batch: int = 8, image_size: int = 224,
                        params=None, ckpt: str = None) -> np.ndarray:
    """Global descriptors for a frame list (run.py:83-95); the model comes
    from the plugin registry ('netvlad', 'dir', ...).

    ckpt: for 'netvlad', path to an hloc MatConvNet `*_struct.mat`
    checkpoint (reference netvlad.py:45-157); loads pretrained weights and
    the matching 0-255 preprocessing via netvlad_weights."""
    import cv2
    import jax
    import jax.numpy as jnp

    from ..data.reader import load_image
    from . import get_retrieval_model

    if ckpt is not None and method == "netvlad":
        from .netvlad_weights import load_matconvnet_netvlad

        model, params = load_matconvnet_netvlad(ckpt)
    else:
        model = get_retrieval_model(method)
    rng = jax.random.PRNGKey(0)
    if params is None:
        params = jax.jit(model.init)(
            rng, jnp.zeros((1, image_size, image_size, 3)))

    @jax.jit
    def embed(params, imgs):
        return model.apply(params, imgs)

    descs = []
    buf = []
    for fr in frames:
        img = load_image(os.path.join(base_dir, fr["file_name"]))
        img = cv2.resize(img, (image_size, image_size),
                         interpolation=cv2.INTER_AREA).astype(np.float32) / 255.0
        buf.append(img)
        if len(buf) == batch:
            descs.append(np.asarray(embed(params, jnp.stack(buf))))
            buf = []
    if buf:
        pad = batch - len(buf)
        x = jnp.stack(buf + [buf[-1]] * pad)
        descs.append(np.asarray(embed(params, x))[: len(buf)])
    return np.concatenate(descs, axis=0)


def run_scene_retrieval(store, method: str, k: int,
                        interval_train: int = 1, interval_test: int = 1,
                        netvlad_params=None, ckpt: str = None) -> Dict[str, Dict]:
    """Produce + dump both pkls for one SceneStore. Returns metrics."""
    from .pipeline import evaluate_retrieval  # self-import for clarity

    def poses_of(frames):
        out = {}
        for f in frames:
            Tcw = np.asarray(f["extrinsic_Tcw"], np.float64)
            T = np.eye(4)
            T[:3] = Tcw[:3]
            out[f["file_name"]] = np.linalg.inv(T)
        return out

    train_poses = poses_of(store.train_frames)
    test_poses = poses_of(store.test_frames)

    if method == "oracle":
        train_to_train = retrieve_top_k_oracle(train_poses, train_poses, k,
                                               interval=interval_train)
        test_to_train = retrieve_top_k_oracle(test_poses, train_poses, k,
                                              interval=interval_test)
    else:
        train_names = [f["file_name"] for f in store.train_frames]
        test_names = [f["file_name"] for f in store.test_frames]
        d_train = extract_descriptors(store.train_frames, store.base_dir,
                                      method=method, params=netvlad_params,
                                      ckpt=ckpt)
        d_test = extract_descriptors(store.test_frames, store.base_dir,
                                     method=method, params=netvlad_params,
                                     ckpt=ckpt)
        train_to_train = retrieve_top_k(d_train, train_names, d_train,
                                        train_names, k,
                                        interval=interval_train)
        test_to_train = retrieve_top_k(d_test, test_names, d_train,
                                       train_names, k,
                                       interval=interval_test)

    metrics = evaluate_retrieval(train_poses, test_poses, test_to_train,
                                 max_k=k)
    for split, table in (("train", train_to_train), ("test", test_to_train)):
        path = os.path.join(store.scene_dir,
                            f"image_retrieval_{split}_{method}.pkl")
        with open(path, "wb") as f:
            pickle.dump(table, f)
    return metrics


def main():
    import argparse

    from ..configs import load_config
    from ..data.scene_store import SceneStore

    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--method", type=str, default=None)
    args = p.parse_args()
    cfg = load_config(args.config)
    method = args.method or cfg.image_retrieval_method

    from ..data.factory import load_data_yaml
    dc = load_data_yaml(cfg.dataset_type)
    base_dir = cfg.datadir or dc.get("base_dir", "")
    scenes = list(cfg.scenes) or list(dc.get("scenes", []))
    for scene in scenes:
        # raw store, no recenter/rescale side effects needed for retrieval
        store = SceneStore.load(base_dir, scene)
        m = run_scene_retrieval(store, method, cfg.image_core_set_size,
                                cfg.image_retrieval_interval_train,
                                cfg.image_retrieval_interval_test)
        print(scene, m)


if __name__ == "__main__":
    main()
