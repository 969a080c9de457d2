"""Evaluation / localization CLI.

Rebuild of the reference eval entry (reference: pl/test.py:1-68 +
pl/model.py:92-276): loads a checkpoint, runs the full localization pipeline
(match -> on-device PnP -> optional photometric pose refinement), reports
per-scene median rotation/translation errors and pose accuracy, optionally
renders test views for PSNR.

Usage:
  python -m nerfloc_tpu.cli.test --config configs/7scenes_all.yaml \
      --ckpt runs/exp/default/ckpts [--optimize_pose] [--vis_rendering]
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, required=False, default=None)
    p.add_argument("--datadir", type=str, default=None)
    p.add_argument("--out", type=str, default=None, help="results json path")
    p.add_argument("--optimize_pose", action="store_true", default=None)
    p.add_argument("--vis_rendering", action="store_true", default=None)
    p.add_argument("--test_render_interval", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from ..configs import load_config, override_cfg_with_args
    from ..data import build_dataset, device_batch
    from ..models.pose_estimator import NerfPoseEstimator
    from ..parallel.mesh import MeshSpec, make_mesh
    from ..train import create_train_state, make_eval_step
    from ..train.checkpoint import CheckpointManager, partial_restore
    from ..train.evaluate import eval_dataset

    args = parse_args()
    cfg = load_config(args.config)
    cfg = override_cfg_with_args(cfg, args)

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshSpec(data=n_dev, ray=1))
    batch_size = n_dev

    test_ds = build_dataset(cfg, "test", mode="test")
    scene_names = {i: n for i, n in enumerate(test_ds.scene_names())}

    model = NerfPoseEstimator(cfg)
    rng = jax.random.PRNGKey(args.seed)
    init_batch = {k: jax.numpy.asarray(v)
                  for k, v in device_batch(test_ds[0]).items()}
    params = model.init(rng, init_batch, rng)
    if args.ckpt:
        # orbax needs a shape/dtype template; build one from a fresh state
        template = create_train_state(params, cfg)
        restored = CheckpointManager(args.ckpt).restore(template=template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {args.ckpt}")
        params = partial_restore(params, restored["params"])
        print(f"loaded checkpoint from {args.ckpt} (step {restored['step']})")

    eval_step = make_eval_step(model, cfg, mesh)
    with mesh:
        results = eval_dataset(test_ds, eval_step, params, mesh, batch_size,
                               rng, scene_names, cfg)
    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"per_scene": results}, f)


if __name__ == "__main__":
    main()
