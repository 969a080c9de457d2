"""Training CLI.

Rebuild of the reference trainer entry (reference: pl/train.py:1-124):
config merge + arg overrides, dataset/dataloader construction, auto-resume
from the latest checkpoint, optional warm-start from cfg.ckpt (shape-matched
partial restore), epoch loop with periodic eval, metric-keyed checkpointing.

TPU differences: the Lightning DDP launch (pl/train.py:100-117) becomes one
SPMD program over a (data, ray) mesh; the eval all_gather becomes device->host
array collection from the sharded eval step; logging is JSONL + stdout (no
TensorBoard dependency).

Usage:
  python -m nerfloc_tpu.cli.train --config configs/7scenes_all.yaml \
      [--datadir ...] [--basedir runs/] [--max_epochs N]
"""
from __future__ import annotations

import argparse
import json
import os
import time
import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--datadir", type=str, default=None)
    p.add_argument("--basedir", type=str, default="runs")
    p.add_argument("--expname", type=str, default=None)
    p.add_argument("--version", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None,
                   help="warm-start checkpoint dir (partial restore)")
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--lrate", type=float, default=None)
    p.add_argument("--batch", type=int, default=None,
                   help="global query batch == mesh data width")
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--train_render_views", type=int, default=2,
                   help="test views rendered per epoch eval for psnr_test "
                        "(0 disables; reference logs psnr_test every val "
                        "epoch, pl/model.py:123-164)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from ..configs import load_config, override_cfg_with_args
    from ..data import build_dataset, device_batch
    from ..models.pose_estimator import NerfPoseEstimator
    from ..parallel.mesh import MeshSpec, make_mesh, shard_batch
    from ..train import create_train_state, make_eval_step, make_train_step
    from ..train.checkpoint import CheckpointManager, partial_restore

    args = parse_args()
    cfg = load_config(args.config)
    cfg = override_cfg_with_args(cfg, args)

    run_dir = os.path.join(args.basedir, cfg.expname or "default",
                           cfg.version)
    os.makedirs(run_dir, exist_ok=True)
    log_path = os.path.join(run_dir, "log.jsonl")

    n_dev = len(jax.devices())
    batch_size = args.batch or n_dev
    mesh = make_mesh(MeshSpec(data=min(batch_size, n_dev), ray=1))

    train_ds = build_dataset(cfg, "train", mode="train")
    test_ds = build_dataset(cfg, "test", mode="test")
    scene_names = {i: n for i, n in enumerate(test_ds.scene_names())}

    from ..configs import compute_dtype_of

    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    rng = jax.random.PRNGKey(args.seed)
    init_item = device_batch(train_ds[0])
    init_batch = {k: jax.numpy.asarray(v) for k, v in init_item.items()}
    # jitted init: eager init is thousands of small ops (pathological on
    # remote-TPU transports)
    params = jax.jit(model.init)(rng, init_batch, rng)

    # metric-keyed best streams alongside the recency stream (reference
    # pl/train.py:55-85: ModelCheckpoint on pose_acc / median_trans_err /
    # psnr_test plus save_last)
    from ..train.checkpoint import DEFAULT_METRIC_MODES

    mgr = CheckpointManager(os.path.join(run_dir, "ckpts"),
                            metric_keys=DEFAULT_METRIC_MODES)
    with mesh:
        state = create_train_state(params, cfg)
        # auto-resume (reference pl/train.py:92-98)
        latest = mgr.latest_step()
        if latest is not None:
            restored = mgr.restore(latest, template=state)
            state = state.replace(step=restored["step"],
                                  params=restored["params"],
                                  opt_state=restored["opt_state"])
            print(f"resumed from step {latest}")
        elif args.ckpt:
            restored = CheckpointManager(args.ckpt).restore()
            if restored is not None:
                state = state.replace(params=partial_restore(
                    state.params, restored["params"]))
                print(f"warm-started from {args.ckpt}")

        train_step = make_train_step(model, cfg, mesh)
        eval_step = make_eval_step(model, cfg, mesh)

        from ..data.prefetch import BatchLoader

        loader = BatchLoader(train_ds, batch_size, shuffle=True,
                             seed=args.seed)
        render_psnr_fn = None  # built lazily, cached across epoch evals
        # resume at the saved epoch, not 0 — otherwise an auto-resumed run
        # trains max_epochs ON TOP of what the checkpoint already has
        # (reference Lightning resume restores the epoch counter,
        # pl/train.py:92-98)
        # len(loader) applies the loader's own drop_last rule (floor by
        # default) — a ceiling here undercounts completed epochs whenever
        # len(train_ds) % batch_size != 0 and re-trains them on resume
        steps_per_epoch = max(1, len(loader))
        start_epoch = min(int(state.step) // steps_per_epoch,
                          cfg.max_epochs)
        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            for it, host_batch in enumerate(loader.epoch(epoch)):
                batch = shard_batch(host_batch, mesh)
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, batch, step_rng)
                if it % 50 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(epoch=epoch, it=it, step=int(state.step),
                             sec_per_it=(time.time() - t0) / (it + 1))
                    print(json.dumps(m))
                    with open(log_path, "a") as f:
                        f.write(json.dumps(m) + "\n")

            if (epoch + 1) % args.eval_interval == 0:
                from ..train.evaluate import (eval_dataset,
                                              make_render_psnr_fn,
                                              render_psnr_eval)

                results = eval_dataset(test_ds, eval_step, state.params, mesh,
                                       batch_size, rng, scene_names, cfg)
                if args.train_render_views > 0:
                    if render_psnr_fn is None:
                        render_psnr_fn = make_render_psnr_fn(model)
                    results["avg"].update(render_psnr_eval(
                        render_psnr_fn, state.params, test_ds,
                        max_views=args.train_render_views))
                print(json.dumps({"epoch": epoch, "eval": results}))
                with open(log_path, "a") as f:
                    f.write(json.dumps({"epoch": epoch, "eval": results}) + "\n")
                mgr.save(int(state.step), state,
                         metrics={k: results["avg"][k]
                                  for k in ("pose_acc", "median_trans_err_m",
                                            "psnr_test")
                                  if k in results["avg"]})
            else:
                mgr.save(int(state.step), state)


if __name__ == "__main__":
    main()
