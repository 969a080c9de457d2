"""End-to-end localization accuracy: multi-scene, full-feature (VERDICT r3 #2).

Closes the loop nothing else closes: train ONE conditional model jointly on
several visually-distinct on-disk synthetic scenes through the REAL CLIs
(MultiSceneDataset path), then run the full eval pipeline (features -> 3D
descriptors -> coarse/fine matching -> on-device PnP-RANSAC -> cascade
re-matching -> photometric pose refinement) and report the per-scene median
rotation/translation table — the reference's headline metric and its core
scene-agnostic claim (reference pl/model.py:192-261; cascade
nerf_pose_estimator.py:330-349; refinement pose_optimizer.py:39-199).

Each scene differs in texture field (data/synthetic.texture tex variants),
box size, and camera orbit, so the model can only localize by conditioning
on the support views, not by memorizing one scene.

With --ablate the test CLI runs twice — full features vs cascade/refinement
off — to show the hard features do not hurt (VERDICT r3 item 2 done-bar).

Usage (real TPU, default env — budget ~60-90 min at 3 scenes):
  python tools/e2e_pose_study.py [--epochs N] [--scenes N] [--ablate]
Quick CPU-mesh shape check:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/e2e_pose_study.py --epochs 1 --n_train 8 --n_test 2 --scenes 2
"""
import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nerfloc_tpu.data.synthetic import look_at_pose, render_box_view  # noqa: E402

H0, W0 = 96, 128

# (texture variant, box half-extent, camera orbit radius scale)
SCENE_VARIANTS = [
    (0, 2.0, 1.0),   # the round-3 single-scene study's scene, unchanged
    (1, 1.5, 0.9),
    (2, 2.6, 1.2),
    (3, 2.2, 0.8),
]


def write_scene(root, scene="box", n_train=48, n_test=8, n_support=6,
                tex=0, box_half=2.0, radius_scale=1.0, orbit_jitter=0.0):
    import cv2

    sd = os.path.join(root, scene)
    os.makedirs(os.path.join(sd, "seq0"), exist_ok=True)
    f = 0.9 * W0
    K = np.array([[f, 0, W0 / 2], [0, f, H0 / 2], [0, 0, 1]])
    near = 0.25 * box_half
    far = 2.0 * box_half * np.sqrt(3.0) + 0.1
    r_eye = 0.3 * radius_scale * box_half / 2.0
    r_tgt = box_half

    def make_frames(n, split, angle0, step):
        frames, angles = [], []
        for i in range(n):
            ang = angle0 + step * i
            # orbit_jitter > 0 modulates the orbit radius/height with
            # incommensurate sinusoids (deterministic): a constant-radius
            # orbit looking at walls ~2 m away is a near-planar PnP
            # configuration whose rotation<->translation gauge amplifies
            # ~1.5 px match noise into degrees (BASELINE.md round-4 solver
            # validation); radius variation adds the depth parallax that
            # breaks the gauge, as real handheld trajectories do.
            rj = 1.0 + orbit_jitter * np.sin(2.39996 * ang + 0.7)
            hj = 1.0 + 3.0 * orbit_jitter * np.cos(1.61803 * ang)
            eye = np.array([r_eye * rj * np.cos(ang),
                            r_eye / 6.0 * hj * np.sin(3 * ang),
                            r_eye * rj * np.sin(ang)])
            tgt = np.array([r_tgt * np.cos(ang), 0.0, r_tgt * np.sin(ang)])
            c2w = look_at_pose(eye, tgt)
            rgb, depth = render_box_view(c2w, K, H0, W0, box_half=box_half,
                                         tex=tex)
            img_name = f"{scene}/seq0/{split}_frame{i}.png"
            dep_name = f"{scene}/seq0/{split}_frame{i}.depth.png"
            cv2.imwrite(os.path.join(root, img_name),
                        cv2.cvtColor((rgb * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(root, dep_name),
                        (depth * 1000).astype(np.uint16))
            frames.append({
                "file_name": img_name,
                "depth_file_name": dep_name,
                "extrinsic_Tcw": np.linalg.inv(c2w)[:3],
                "camera_intrinsic": K,
                "near": near,
                "far": far,
                "sequence_id": "seq0",
                "frame_id": i,
            })
            angles.append(ang)
        return frames, np.asarray(angles)

    # full circle of train views; test views interleaved at offset angles
    train, a_train = make_frames(n_train, "train", 0.0,
                                 2 * np.pi / n_train)
    test, a_test = make_frames(n_test, "test", 2 * np.pi / n_train * 0.37,
                               2 * np.pi / n_test)
    with open(os.path.join(sd, "info_train.pkl"), "wb") as fh:
        pickle.dump(train, fh)
    with open(os.path.join(sd, "info_test.pkl"), "wb") as fh:
        pickle.dump(test, fh)

    def nearest_train(ang):
        # circular angular distance to every train view
        d = np.abs(np.angle(np.exp(1j * (a_train - ang))))
        order = np.argsort(d)
        return [train[j]["file_name"] for j in order[:n_support]]

    retrieval = {}
    for fr, ang in zip(train, a_train):
        # exclude self for train queries (reference retrieval pkls do the
        # same; the dataset additionally drops identical filenames)
        d = np.abs(np.angle(np.exp(1j * (a_train - ang))))
        order = [j for j in np.argsort(d) if train[j]["file_name"]
                 != fr["file_name"]]
        retrieval[fr["file_name"]] = [train[j]["file_name"]
                                      for j in order[:n_support]]
    for fr, ang in zip(test, a_test):
        retrieval[fr["file_name"]] = nearest_train(ang)
    for split in ("train", "test"):
        with open(os.path.join(sd, f"image_retrieval_{split}_netvlad.pkl"),
                  "wb") as fh:
            pickle.dump(retrieval, fh)

    # minimal pc.ply (scene store wants it); backproject a sparse grid
    from nerfloc_tpu.data.ply import write_ply_points
    pts = []
    for frdict in train[::6]:
        c2w = np.eye(4)
        c2w[:3] = np.linalg.inv(np.vstack([frdict["extrinsic_Tcw"],
                                           [0, 0, 0, 1]]))[:3]
        rgb, depth = render_box_view(c2w, K, 24, 32, box_half=box_half,
                                     tex=tex)
        f2 = K.copy()
        f2[0] *= 32 / W0
        f2[1] *= 24 / H0
        u, v = np.meshgrid(np.arange(32), np.arange(24))
        z = depth
        x = (u - f2[0, 2]) / f2[0, 0] * z
        y = (v - f2[1, 2]) / f2[1, 1] * z
        pc = np.stack([x, y, z], -1).reshape(-1, 3)
        pts.append(pc @ c2w[:3, :3].T + c2w[:3, 3])
    write_ply_points(os.path.join(sd, "pc.ply"), np.concatenate(pts))


def write_cfg(path, data_yaml, epochs, full_features: bool,
              fpn_dim=64, hidden=64, matcher=96, n_importance=0):
    # N_samples + N_importance stays 16: RayUnet norm shapes depend on the
    # TOTAL sample count, so the guided row evaluates the dense-trained
    # checkpoint with identical param shapes (conditional_nerf.py:105)
    n_dense = 16 - n_importance
    with open(path, "w") as f:
        f.write(f"""expname: e2e_pose
dataset_type: {data_yaml}
backbone2d_fpn_dim: {fpn_dim}
model_3d_hidden_dim: {hidden}
matcher_hidden_dim: {matcher}
n_views_train: 4
n_views_test: 6
lrate: 5.0e-4
max_epochs: {epochs}
cascade_matching: {str(full_features).lower()}
optimize_pose: {str(full_features).lower()}
render: {{N_samples: {n_dense}, N_importance: {n_importance}, N_rand: 128}}
matching: {{coarse_num_3d_keypoints: 256, fine_num_3d_keypoints: 256,
            max_kp2d: 96, max_fine_pairs: 128,
            coarse_matching_depth_thresh: 0.5}}
shapes: {{n_views: 6, image_h: 64, image_w: 96, n_rays_train: 128,
          pnp_hypotheses: 256, pose_refine_rays: 128}}
""")


def run_test(cfg_yaml, ckpt, out_json, env):
    test_cmd = [sys.executable, "-u", "-m", "nerfloc_tpu.cli.test",
                "--config", cfg_yaml, "--ckpt", ckpt, "--out", out_json]
    print("+", " ".join(test_cmd), flush=True)
    subprocess.run(test_cmd, check=True, env=env, cwd=REPO)
    with open(out_json) as f:
        return json.load(f)["per_scene"]


def table(res):
    rows = []
    for scene, r in sorted(res.items()):
        if not isinstance(r, dict) or "median_rot_err_deg" not in r:
            continue
        rows.append(f"  {scene:<12} rot {r['median_rot_err_deg']:6.2f} deg  "
                    f"trans {r['median_trans_err_m'] * 100:6.1f} cm  "
                    f"pose_acc {r.get('pose_acc', float('nan')):.2f}  "
                    f"(n={r.get('n', '?')})")
    return "\n".join(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/e2e_scenes")
    ap.add_argument("--runs", default="/tmp/e2e_runs_ms")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--skip_scene", action="store_true")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--orbit_jitter", type=float, default=0.0,
                    help="modulate orbit radius/height (0.3 = +-30%%) to "
                         "break the constant-radius PnP gauge degeneracy")
    ap.add_argument("--ablate", action="store_true",
                    help="also evaluate with cascade/refinement OFF")
    ap.add_argument("--guided", action="store_true",
                    help="also evaluate with NeuRay-guided 8+8 sampling "
                         "(same checkpoint; the study-scale analogue of "
                         "bench.py's guided-16+16 vs dense-64 claim)")
    ap.add_argument("--fpn_dim", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--matcher", type=int, default=96,
                    help="matcher width (must be divisible by 6 — 3D "
                         "positional embedding); the multi-scene coarse "
                         "matcher is "
                         "capacity-bound at 96 (round-4 study: eval IoU "
                         "0.01 multi-scene vs 0.47 single-scene)")
    args = ap.parse_args()

    names = [f"box{i}" for i in range(args.scenes)]
    if not args.skip_scene:
        for i, name in enumerate(names):
            tex, bh, rs = SCENE_VARIANTS[i % len(SCENE_VARIANTS)]
            print(f"writing {name}: tex={tex} box_half={bh} radius x{rs}",
                  flush=True)
            write_scene(args.root, scene=name, n_train=args.n_train,
                        n_test=args.n_test, tex=tex, box_half=bh,
                        radius_scale=rs, orbit_jitter=args.orbit_jitter)

    data_yaml = os.path.join(args.root, "data.yaml")
    with open(data_yaml, "w") as f:
        # Reference-parity train augmentation (reference
        # configs/data/7scenes.yaml AUG_TRANSFORM): without it the coarse
        # transformer MEMORIZES the train views (coarse_loss -> 2e-7) and
        # test-view matching IoU collapses to ~0.03 in the multi-scene
        # setting (round-4 study, BASELINE.md).
        f.write(f"""name: e2e_boxes
base_dir: {args.root}
scenes: [{", ".join(names)}]
AUG_TRANSFORM:
  - RandomZoom: {{aug_scale_min: 0.666, aug_scale_max: 1.5}}
  - RandomRotate: {{aug_rotation: 30}}
  - ColorJitter: {{brightness: 0.1, contrast: 0.1, saturation: 0.1, hue: 0.1}}
aug_ref_depth: true
""")
    cfg_yaml = os.path.join(args.root, "cfg.yaml")
    dims = dict(fpn_dim=args.fpn_dim, hidden=args.hidden,
                matcher=args.matcher)
    write_cfg(cfg_yaml, data_yaml, args.epochs, full_features=True, **dims)

    env = dict(os.environ)
    if not args.skip_train:
        train_cmd = [sys.executable, "-u", "-m", "nerfloc_tpu.cli.train",
                     "--config", cfg_yaml, "--basedir", args.runs,
                     "--batch", str(args.batch), "--eval_interval", "10"]
        print("+", " ".join(train_cmd), flush=True)
        subprocess.run(train_cmd, check=True, env=env, cwd=REPO)

    ckpt = os.path.join(args.runs, "e2e_pose", "default", "ckpts")
    res_full = run_test(cfg_yaml, ckpt,
                        os.path.join(args.runs, "e2e_test_full.json"), env)
    print("\nPer-scene (cascade + photometric refinement ON):")
    print(table(res_full))
    avg = res_full["avg"]
    print(f"  avg: rot {avg['median_rot_err_deg']:.2f} deg / "
          f"trans {avg['median_trans_err_m'] * 100:.1f} cm / "
          f"pose_acc {avg['pose_acc']:.2f}")

    if args.ablate:
        cfg_off = os.path.join(args.root, "cfg_basic.yaml")
        write_cfg(cfg_off, data_yaml, args.epochs, full_features=False,
                  **dims)
        res_off = run_test(cfg_off, ckpt,
                           os.path.join(args.runs, "e2e_test_basic.json"),
                           env)
        print("\nPer-scene (cascade/refinement OFF, same checkpoint):")
        print(table(res_off))
        a = res_off["avg"]
        print(f"  avg: rot {a['median_rot_err_deg']:.2f} deg / "
              f"trans {a['median_trans_err_m'] * 100:.1f} cm / "
              f"pose_acc {a['pose_acc']:.2f}")

    if args.guided:
        cfg_g = os.path.join(args.root, "cfg_guided.yaml")
        write_cfg(cfg_g, data_yaml, args.epochs, full_features=True,
                  n_importance=8, **dims)
        res_g = run_test(cfg_g, ckpt,
                         os.path.join(args.runs, "e2e_test_guided.json"),
                         env)
        print("\nPer-scene (guided 8+8 sampling, same checkpoint):")
        print(table(res_g))
        a = res_g["avg"]
        print(f"  avg: rot {a['median_rot_err_deg']:.2f} deg / "
              f"trans {a['median_trans_err_m'] * 100:.1f} cm / "
              f"pose_acc {a['pose_acc']:.2f}")


if __name__ == "__main__":
    main()
