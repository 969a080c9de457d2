"""MatConvNet NetVLAD loader: structural + descriptor parity.

No real checkpoint exists in this image (zero egress), so a structurally
faithful `*_struct.mat` is synthesized (same nesting as hloc's exports, with
scaled-down channel widths) and saved through scipy. Descriptor parity is
checked against a functional torch replica of the reference forward
(reference nerf_loc/models/image_retrieval/netvlad.py:31-157: 0-255 average-
image preprocessing, VGG conv stack, pre-norm, soft-assign VLAD with negated
centers, intra+global L2, whitening, final L2).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

# scaled-down VGG16 widths (structure identical: 13 convs, pools after
# blocks 1-4, no activation after conv5_3)
CFG = (8, 8, "M", 16, 16, "M", 32, 32, 32, "M", 64, 64, 64, "M", 64, 64, 64)
D, K, OUT = 64, 8, 32


def _make_mat(tmp_path, rng):
    from scipy.io import savemat

    layers = []
    in_c = 3
    for c in CFG:
        if c == "M":
            layers.append({"type": "pool"})
            continue
        w = rng.standard_normal((3, 3, in_c, c)).astype(np.float32) * 0.2
        b = rng.standard_normal(c).astype(np.float32) * 0.1
        layers.append({"type": "conv", "weights": [w, b]})
        layers.append({"type": "relu"})
        in_c = c
    layers = layers[:-1]  # strip the ReLU after the last conv

    score_w = rng.standard_normal((D, K)).astype(np.float32) * 0.3
    centers_neg = rng.standard_normal((D, K)).astype(np.float32) * 0.3
    layers.append({"type": "vlad", "weights": [score_w, centers_neg]})

    ww = rng.standard_normal((1, 1, D * K, OUT)).astype(np.float32) * 0.05
    wb = rng.standard_normal(OUT).astype(np.float32) * 0.01
    layers.append({"type": "whiten", "weights": [ww, wb]})

    avg = np.array([[110.0, 115.0, 120.0]], dtype=np.float32)
    net = {"layers": np.array(layers, dtype=object),
           "meta": {"normalization": {"averageImage": avg}}}
    path = str(tmp_path / "fake_struct.mat")
    savemat(path, {"net": net})
    return path, layers, avg.reshape(-1)


def _torch_reference(image01, layers, avg):
    """Reference forward (netvlad.py:131-157) in functional torch."""
    x = torch.tensor(image01.transpose(0, 3, 1, 2))
    x = torch.clamp(x * 255.0, 0.0, 255.0)
    x = x - torch.tensor(avg).view(1, -1, 1, 1)

    conv_entries = [l for l in layers if l.get("type") == "conv"]
    i = 0
    n = len(conv_entries)
    for l in layers:
        t = l.get("type")
        if t == "conv":
            w, b = l["weights"]
            # mat HWIO -> torch OIHW (netvlad.py:96-100)
            wt = torch.tensor(w).permute(3, 2, 0, 1)
            x = torch.nn.functional.conv2d(x, wt, torch.tensor(b), padding=1)
            i += 1
            if i < n:
                x = torch.relu(x)
        elif t == "pool":
            x = torch.nn.functional.max_pool2d(x, 2)
    b_, c, _, _ = x.shape
    x = x.reshape(b_, c, -1)
    x = torch.nn.functional.normalize(x, dim=1)

    vlad_l = [l for l in layers if l.get("type") == "vlad"][0]
    score_w, centers_neg = vlad_l["weights"]
    scores = torch.einsum("dk,bdn->bkn", torch.tensor(score_w), x)
    scores = torch.softmax(scores, dim=1)
    centers = -torch.tensor(centers_neg)  # stored negated (netvlad.py:105)
    diff = x.unsqueeze(2) - centers.unsqueeze(0).unsqueeze(-1)  # [B,D,K,N]
    desc = (scores.unsqueeze(1) * diff).sum(dim=-1)             # [B,D,K]
    desc = torch.nn.functional.normalize(desc, dim=1)           # intra-norm
    desc = desc.reshape(b_, -1)                                 # D-major
    desc = torch.nn.functional.normalize(desc, dim=1)

    wl = [l for l in layers if l.get("type") == "whiten"][0]
    ww, wb = wl["weights"]
    desc = desc @ torch.tensor(ww.reshape(D * K, OUT)) + torch.tensor(wb)
    return torch.nn.functional.normalize(desc, dim=1).numpy()


def test_matconvnet_load_and_descriptor_parity(tmp_path):
    from nerfloc_tpu.retrieval.netvlad_weights import load_matconvnet_netvlad

    rng = np.random.default_rng(0)
    path, layers, avg = _make_mat(tmp_path, rng)

    module, variables = load_matconvnet_netvlad(path)
    assert module.input_scale == 255.0
    assert module.num_clusters == K and module.out_dim == OUT
    np.testing.assert_allclose(module.pixel_mean, avg)

    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(img)))
    ref = _torch_reference(img, layers, avg)
    assert ours.shape == (2, OUT)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_pipeline_accepts_ckpt(tmp_path):
    """extract_descriptors(ckpt=...) routes through the loader."""
    import cv2

    from nerfloc_tpu.retrieval.pipeline import extract_descriptors

    rng = np.random.default_rng(1)
    path, _, _ = _make_mat(tmp_path, rng)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    frames = []
    for i in range(2):
        img = (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.png"), img)
        frames.append({"file_name": f"{i}.png"})
    d = extract_descriptors(frames, str(img_dir), method="netvlad",
                            image_size=32, ckpt=path)
    assert d.shape == (2, OUT)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-4)
