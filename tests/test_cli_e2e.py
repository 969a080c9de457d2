"""CPU-scale end-to-end CLI pipeline test (VERDICT r3 weak #7).

The only full train->eval accuracy assertion (tests/test_e2e_pose.py) is
TPU-gated, so between rounds nothing in CI proves the CLI path itself still
composes: scene pkls on disk -> MultiSceneDataset -> cli.train (epoch loop,
epoch eval incl. render-PSNR, metric-keyed checkpoints) -> cli.test
(features -> matching -> PnP -> cascade re-matching -> photometric
refinement -> per-scene table). This drives exactly that, at smoke scale on
CPU, through the same tools/e2e_pose_study.py scene writer the TPU study
uses — with cascade_matching and optimize_pose ON, so the "hard features"
run inside the real CLI loop, not only in unit smoke tests.

Asserts structure + finiteness, not accuracy (2 tiny epochs from random
weights localizes nothing; reference headline metric needs the TPU run —
BASELINE.md "End-to-end localization accuracy").

Reference: pl/train.py:1-124 (trainer loop), pl/model.py:192-261 (per-scene
eval table), nerf_pose_estimator.py:330-349 (cascade), pose_optimizer.py
:39-199 (refinement).
"""
import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _cpu_env():
    """Subprocess env: CPU backend, no axon sitecustomize pre-import, no
    virtual-device XLA_FLAGS (1 CPU device; batch 1)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    return env


def _write_tiny_cfg(path, data_yaml, epochs):
    with open(path, "w") as f:
        f.write(f"""expname: cli_e2e
dataset_type: {data_yaml}
backbone2d_fpn_dim: 16
model_3d_hidden_dim: 16
matcher_hidden_dim: 24
n_views_train: 2
n_views_test: 3
lrate: 5.0e-4
max_epochs: {epochs}
cascade_matching: true
optimize_pose: true
render: {{N_samples: 4, N_rand: 8}}
matching: {{coarse_num_3d_keypoints: 16, fine_num_3d_keypoints: 16,
            max_kp2d: 16, max_fine_pairs: 16,
            coarse_matching_depth_thresh: 0.5}}
shapes: {{n_views: 3, image_h: 64, image_w: 96, n_rays_train: 8,
          pnp_hypotheses: 64, pose_refine_rays: 32}}
""")


def test_cli_train_then_test_multiscene(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from e2e_pose_study import SCENE_VARIANTS, write_scene

    root = str(tmp_path / "scenes")
    names = ["box0", "box1"]
    for i, name in enumerate(names):
        tex, bh, rs = SCENE_VARIANTS[i]
        write_scene(root, scene=name, n_train=6, n_test=2, n_support=4,
                    tex=tex, box_half=bh, radius_scale=rs)
    data_yaml = os.path.join(root, "data.yaml")
    with open(data_yaml, "w") as f:
        # exercises the reference-parity aug pipeline inside cli.train
        # (reference configs/data/7scenes.yaml AUG_TRANSFORM)
        f.write(f"""name: cli_e2e_boxes
base_dir: {root}
scenes: [{", ".join(names)}]
AUG_TRANSFORM:
  - RandomZoom: {{aug_scale_min: 0.8, aug_scale_max: 1.25}}
  - RandomRotate: {{aug_rotation: 15}}
  - ColorJitter: {{brightness: 0.1, contrast: 0.1, saturation: 0.1, hue: 0.1}}
aug_ref_depth: true
""")
    cfg_yaml = os.path.join(root, "cfg.yaml")
    _write_tiny_cfg(cfg_yaml, data_yaml, epochs=2)
    runs = str(tmp_path / "runs")

    env = _cpu_env()
    r = subprocess.run(
        [sys.executable, "-u", "-m", "nerfloc_tpu.cli.train",
         "--config", cfg_yaml, "--basedir", runs, "--batch", "1",
         "--eval_interval", "1", "--train_render_views", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-4000:]}\nstderr:\n{r.stderr[-4000:]}"

    # the epoch eval logged psnr_test (render observability, VERDICT r3 #3/#4)
    log = os.path.join(runs, "cli_e2e", "default", "log.jsonl")
    evals = [json.loads(line) for line in open(log) if "eval" in line]
    assert evals and "psnr_test" in evals[-1]["eval"]["avg"], evals
    assert math.isfinite(evals[-1]["eval"]["avg"]["psnr_test"])

    # metric-keyed best streams were written alongside the recency stream
    from nerfloc_tpu.train.checkpoint import discover_best_dirs
    ckpt_dir = os.path.join(runs, "cli_e2e", "default", "ckpts")
    assert "pose_acc" in discover_best_dirs(ckpt_dir)

    out_json = str(tmp_path / "test_out.json")
    r = subprocess.run(
        [sys.executable, "-u", "-m", "nerfloc_tpu.cli.test",
         "--config", cfg_yaml, "--ckpt", ckpt_dir, "--out", out_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-4000:]}\nstderr:\n{r.stderr[-4000:]}"

    with open(out_json) as f:
        per_scene = json.load(f)["per_scene"]
    for name in names + ["avg"]:
        m = per_scene[name]
        assert math.isfinite(m["median_rot_err_deg"]), (name, m)
        assert math.isfinite(m["median_trans_err_m"]), (name, m)
        assert 0.0 <= m["pose_acc"] <= 1.0, (name, m)
    assert per_scene["avg"]["n"] == 4  # 2 scenes x 2 test frames
