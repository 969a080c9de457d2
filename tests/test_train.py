"""SPMD train/eval step over the virtual 8-device CPU mesh + checkpoint utils.

Covers the pmap/pjit paths the reference exercises only via full DDP runs
(SURVEY.md §4: no fake backend in the reference; here we simulate devices).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import create_train_state, make_train_step, make_eval_step
from nerfloc_tpu.train.checkpoint import partial_restore
from nerfloc_tpu.utils.metrics import aggregate_per_scene, matching_iou


def tiny_cfg():
    return Config(
        backbone2d_fpn_dim=16,
        model_3d_hidden_dim=16,
        matcher_hidden_dim=24,
        n_views_train=2,
        render=RenderConfig(N_samples=4, N_rand=8, use_render_uncertainty=True),
        matching=MatchingConfig(fine_num_3d_keypoints=16,
                                coarse_num_3d_keypoints=16),
        shapes=dataclasses.replace(Config().shapes, pnp_hypotheses=32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = NerfPoseEstimator(cfg)
    items = [device_batch(make_query_batch(n_views=2, H=32, W=32, seed=i))
             for i in range(2)]
    host_batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_batch = {k: jnp.asarray(v[0]) for k, v in host_batch.items()}
    params = model.init(rng, init_batch, rng)
    return cfg, model, params, host_batch


def test_train_step_2dev_mesh(setup):
    cfg, model, params, host_batch = setup
    mesh = make_mesh(MeshSpec(data=2, ray=1))
    with mesh:
        # own copy: train_step donates the state, which would delete the
        # module-scoped params fixture shared with the eval test
        state = create_train_state(jax.tree.map(jnp.copy, params), cfg)
        batch = shard_batch(host_batch, mesh)
        step = make_train_step(model, cfg, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss0 = float(metrics["loss"])
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(loss0)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["grad_norm"]))
    assert "matching_iou" in metrics


def test_eval_step_runs_pnp(setup):
    cfg, model, params, host_batch = setup
    mesh = make_mesh(MeshSpec(data=2, ray=1))
    with mesh:
        batch = shard_batch(host_batch, mesh)
        ev = make_eval_step(model, cfg, mesh)
        out = ev(params, batch, jax.random.PRNGKey(3))
    assert out["rot_err_deg"].shape == (2,)
    assert np.isfinite(np.asarray(out["rot_err_deg"])).all()
    assert np.isfinite(np.asarray(out["trans_err_m"])).all()
    assert out["pose_pred"].shape == (2, 4, 4)
    # test-time matching IoU (reference pl/model.py:111-112)
    iou = np.asarray(out["matching_iou"])
    assert iou.shape == (2,)
    assert np.isfinite(iou).all() and (iou >= 0).all() and (iou <= 1).all()


def test_partial_restore_shape_matching():
    p = {"a": {"w": jnp.zeros((3, 3)), "b": jnp.zeros((4,))},
         "new_head": {"w": jnp.ones((2, 2))}}
    r = {"a": {"w": jnp.full((3, 3), 7.0), "b": jnp.zeros((9,))}}
    out = partial_restore(p, r)
    np.testing.assert_allclose(np.asarray(out["a"]["w"]), 7.0)   # loaded
    assert out["a"]["b"].shape == (4,)                            # shape kept
    np.testing.assert_allclose(np.asarray(out["new_head"]["w"]), 1.0)  # fresh


def test_checkpoint_best_retention(tmp_path):
    """A later WORSE save never evicts the best checkpoint (reference
    pl/train.py:55-85 metric-keyed ModelCheckpoint), and restore(best=...)
    returns it; the recency stream still serves auto-resume."""
    from nerfloc_tpu.train.checkpoint import (CheckpointManager,
                                              discover_best_dirs)

    def st(i, v):
        return {"step": i, "params": {"w": np.full(3, float(v))},
                "opt_state": {"m": np.zeros(3)}}

    d = str(tmp_path / "ckpts")
    mgr = CheckpointManager(d, max_to_keep=2,
                            metric_keys={"pose_acc": "max",
                                         "median_trans_err_m": "min"})
    mgr.save(1, st(1, 1.0), metrics={"pose_acc": 0.5,
                                     "median_trans_err_m": 0.10})
    mgr.save(2, st(2, 2.0), metrics={"pose_acc": 0.9,
                                     "median_trans_err_m": 0.03})
    mgr.save(3, st(3, 3.0), metrics={"pose_acc": 0.4,
                                     "median_trans_err_m": 0.20})
    mgr.save(4, st(4, 4.0))  # metric-less save (non-eval epoch)

    assert mgr.latest_step() == 4
    assert mgr.best_step("pose_acc") == 2
    assert mgr.best_step("median_trans_err_m") == 2
    r = mgr.restore(best="pose_acc", template=st(0, 0.0))
    np.testing.assert_allclose(np.asarray(r["params"]["w"]), 2.0)
    # recency retention dropped steps 1-2 from the main stream
    r_latest = mgr.restore(template=st(0, 0.0))
    np.testing.assert_allclose(np.asarray(r_latest["params"]["w"]), 4.0)
    # a fresh manager (new process) still finds the streams on disk
    assert set(discover_best_dirs(d)) == {"pose_acc", "median_trans_err_m"}
    mgr2 = CheckpointManager(d, metric_keys={"pose_acc": "max"})
    assert mgr2.best_step("pose_acc") == 2


def test_matching_iou_exact():
    match_j = jnp.array([3, 5, 7, 9])
    match_mask = jnp.array([True, True, False, True])
    j_gt = jnp.array([3, 6, 7, 9])
    gt_mask = jnp.array([True, True, True, True])
    # intersection: idx0 (3==3), idx3 (9==9) -> 2 ; union: idx0..3 -> 4
    iou = float(matching_iou(match_j, match_mask, j_gt, gt_mask))
    assert abs(iou - 0.5) < 1e-6


def test_aggregate_per_scene_cambridge_thresholds():
    scene_ids = np.array([0, 0, 1, 1])
    rot = np.array([1.0, 1.0, 1.0, 10.0])
    trans = np.array([0.3, 0.4, 0.1, 0.1])
    names = {0: "StMarysChurch", 1: "ShopFacade"}
    out = aggregate_per_scene(scene_ids, rot, trans, names,
                              dataset_type="video_cambridge",
                              extras={"matching_iou":
                                      np.array([0.2, 0.4, 0.6, 0.8])})
    # StMarys thresh 0.35 -> one of two passes; ShopFacade 0.15 -> one passes
    assert abs(out["StMarysChurch"]["pose_acc"] - 0.5) < 1e-6
    assert abs(out["ShopFacade"]["pose_acc"] - 0.5) < 1e-6
    assert out["avg"]["n"] == 4
    assert abs(out["StMarysChurch"]["matching_iou"] - 0.3) < 1e-6
    assert abs(out["avg"]["matching_iou"] - 0.5) < 1e-6


class _ListDS:
    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]


def test_eval_dataset_prefetch_and_padding(setup):
    """eval_dataset through the threaded prefetcher: 3 items at batch_size=2
    exercises final-batch padding; results carry per-scene matching IoU."""
    from nerfloc_tpu.train.evaluate import eval_dataset

    cfg, model, params, host_batch = setup
    ds = _ListDS([make_query_batch(n_views=2, H=32, W=32, seed=i)
                  for i in range(3)])
    mesh = make_mesh(MeshSpec(data=2, ray=1))
    with mesh:
        ev = make_eval_step(model, cfg, mesh)
        res = eval_dataset(ds, ev, params, mesh, 2, jax.random.PRNGKey(0),
                           {0: "synthetic_box"}, cfg, collect_poses=True)
    assert res["avg"]["n"] == 3
    assert res["synthetic_box"]["n"] == 3
    assert 0.0 <= res["avg"]["matching_iou"] <= 1.0
    assert res["_poses"]["poses_pred"].shape == (3, 4, 4)
    assert len(res["_poses"]["filenames"]) == 3
