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
    p.add_argument("--load_latest", action="store_true",
                   help="load the most recent checkpoint even when a "
                        "metric-keyed best stream exists")
    p.add_argument("--best_metric", type=str, default="pose_acc",
                   help="which best stream to prefer (pose_acc / "
                        "median_trans_err_m / psnr_test)")
    p.add_argument("--optimize_pose", action="store_true", default=None)
    p.add_argument("--vis_rendering", action="store_true", default=None)
    p.add_argument("--test_render_interval", type=int, default=None)
    p.add_argument("--ray_shards", type=int, default=1,
                   help="shard each rendered image's rays over this many "
                        "devices (mesh ray axis); 1 = single-device "
                        "lax.map chunk loop")
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

    # multi-process eval runs process-LOCAL meshes (each process evaluates
    # its test-set shard independently, reference-DDP style) and merges the
    # metric arrays afterwards (train/evaluate.py + parallel/multihost.py)
    devices = jax.local_devices()
    n_dev = len(devices)
    mesh = make_mesh(MeshSpec(data=n_dev, ray=1), devices=devices)
    batch_size = n_dev

    test_ds = build_dataset(cfg, "test", mode="test")
    scene_names = {i: n for i, n in enumerate(test_ds.scene_names())}

    from ..configs import compute_dtype_of

    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    rng = jax.random.PRNGKey(args.seed)
    init_batch = {k: jax.numpy.asarray(v)
                  for k, v in device_batch(test_ds[0]).items()}
    params = jax.jit(model.init)(rng, init_batch, rng)
    if args.ckpt:
        from ..train.checkpoint import (DEFAULT_METRIC_MODES,
                                        discover_best_dirs)

        # orbax needs a shape/dtype template; build one from a fresh state
        template = create_train_state(params, cfg)
        # prefer a metric-keyed best checkpoint when the train run kept one
        # (reference tests the best ModelCheckpoint, pl/train.py:55-85)
        best_dirs = discover_best_dirs(args.ckpt)
        pick = None
        if best_dirs and not args.load_latest:
            pick = (args.best_metric if args.best_metric in best_dirs
                    else sorted(best_dirs)[0])
        if pick is not None:
            mgr = CheckpointManager(
                args.ckpt, metric_keys={pick: DEFAULT_METRIC_MODES.get(
                    pick, "max")})
            restored = mgr.restore(template=template, best=pick)
            label = f"best[{pick}]"
        else:
            restored = CheckpointManager(args.ckpt).restore(template=template)
            label = "latest"
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {args.ckpt}")
        params = partial_restore(params, restored["params"])
        print(f"loaded {label} checkpoint from {args.ckpt} "
              f"(step {restored['step']})")

    eval_step = make_eval_step(model, cfg, mesh)
    collect = cfg.vis_trajectory or cfg.vis_3d_box
    with mesh:
        results = eval_dataset(test_ds, eval_step, params, mesh, batch_size,
                               rng, scene_names, cfg, collect_poses=collect)

    poses = results.pop("_poses", None)
    out_dir = os.path.dirname(args.out) if args.out else "eval_out"
    if cfg.vis_trajectory and poses is not None:
        # trajectory + scene points pkl (reference pl/model.py:263-276)
        from ..utils.visualization import dump_trajectory

        pts = test_ds.datasets[0].store.points if test_ds.datasets else None
        dump_trajectory(os.path.join(out_dir, "trajectory.pkl"),
                        poses["filenames"], poses["poses_pred"],
                        poses["poses_gt"], pts)
    if cfg.vis_3d_box and poses is not None:
        # OnePose-style 3D box overlays (reference pl/model.py:166-177)
        import cv2

        from ..utils.visualization import draw_box3d

        os.makedirs(out_dir, exist_ok=True)
        for i in range(0, len(test_ds), max(cfg.test_render_interval, 1)):
            item = test_ds[i]
            if "bbox3d_corners" not in item:
                continue
            img = (np.asarray(item["image"]) * 255).astype(np.uint8)
            over = draw_box3d(img, np.asarray(item["bbox3d_corners"])[:8],
                              np.asarray(item["K"]), poses["poses_pred"][i])
            cv2.imwrite(os.path.join(out_dir, f"box_{i:05d}.png"),
                        cv2.cvtColor(over, cv2.COLOR_RGB2BGR))

    if cfg.vis_rendering:
        render = render_eval(model, params, cfg, test_ds,
                             out_dir=os.path.dirname(args.out)
                             if args.out else "renders",
                             ray_shards=args.ray_shards)
        results["render"] = render
        # fold render PSNR into the per-scene table (reference pl/model.py:
        # 192-261 reports psnr alongside pose metrics)
        for scene, p in render.get("psnr_per_scene", {}).items():
            if scene in results:
                results[scene]["psnr"] = p
        if render.get("psnr_mean") is not None and "avg" in results:
            results["avg"]["psnr"] = render["psnr_mean"]
    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"per_scene": results}, f)


def render_eval(model, params, cfg, test_ds, out_dir: str = "renders",
                ray_shards: int = 1):
    """Render every `test_render_interval`-th test view, report PSNR, dump
    PNGs (reference test-time rendering, nerf_pose_estimator.py:372-391 +
    pl/model.py:123-164 TB panels). ray_shards > 1 shards each image's rays
    over a (data=1, ray=ray_shards) mesh (parallel/render.py) — the
    multi-chip render path, reachable from the CLI."""
    import jax
    import jax.numpy as jnp

    from ..data import device_batch
    from ..models.fields.losses import img2mse, mse2psnr
    from ..utils.common import colorize_depth

    os.makedirs(out_dir, exist_ok=True)

    if ray_shards > 1:
        from ..parallel.mesh import MeshSpec, make_mesh
        from ..parallel.render import (make_context_builder,
                                       make_ray_sharded_render,
                                       render_image_ray_sharded)

        mesh_r = make_mesh(MeshSpec(data=1, ray=ray_shards),
                           devices=jax.local_devices()[:ray_shards])
        build_ctx = make_context_builder(model, mesh_r)
        rrender = make_ray_sharded_render(model, cfg, mesh_r)

        def render_one(params, batch):
            ctx = build_ctx(params, batch)
            H, W = batch["image"].shape[0], batch["image"].shape[1]
            return render_image_ray_sharded(model, cfg, params, ctx,
                                            batch["K"], batch["pose"],
                                            H, W, mesh_r, render=rrender)
    else:
        @jax.jit
        def render_one(params, batch):
            def f(m):
                ctx, _ = m.build_context(batch)
                H, W = batch["image"].shape[0], batch["image"].shape[1]
                return m.model_3d.render_image(ctx, batch["K"],
                                               batch["pose"], H, W)
            return model.apply(params, method=f)

    psnrs, psnr_scenes = [], []
    for i in range(0, len(test_ds), max(cfg.test_render_interval, 1)):
        item = test_ds[i]
        batch = {k: jnp.asarray(v) for k, v in device_batch(item).items()}
        out = render_one(params, batch)
        mask = out["mask"]
        psnr = float(mse2psnr(img2mse(out["rgb"], batch["image"],
                                      mask=mask)))
        psnrs.append(psnr)
        psnr_scenes.append(item.get("scene", ""))
        try:
            import cv2

            rgb = np.clip(np.asarray(out["rgb"]) * 255, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, f"render_{i:05d}.png"),
                        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
            depth_vis = colorize_depth(np.asarray(out["depth"]),
                                       np.asarray(mask))
            cv2.imwrite(os.path.join(out_dir, f"depth_{i:05d}.png"),
                        cv2.cvtColor((depth_vis * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
        except Exception as e:  # vis failures don't fail the eval
            print(f"render dump failed: {e}")
        print(f"render {i}: psnr={psnr:.2f}")
    per_scene = {}
    for s in set(psnr_scenes):
        vals = [p for p, sc in zip(psnrs, psnr_scenes) if sc == s]
        per_scene[s] = float(np.mean(vals))
    return {"psnr_mean": float(np.mean(psnrs)) if psnrs else None,
            "psnr_per_scene": per_scene,
            "n_rendered": len(psnrs)}


if __name__ == "__main__":
    main()
