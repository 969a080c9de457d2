"""dirtorch AP-GeM weight port: numerical parity vs a torch replica.

Mirrors tests/test_weight_port.py's approach: dirtorch isn't in the image
(the reference's third_party submodule is empty too), so a dirtorch-shaped
state dict is synthesized and torch core replays the exact forward
(conv/frozen-BN bottlenecks -> GeM pool -> fc -> L2) for comparison.
"""
import numpy as np
import pytest

BLOCKS = (1, 1, 1, 1)  # tiny resnet: full channel widths, one block/layer


def _fake_dirtorch_sd(rng, blocks=BLOCKS, out_dim=32):
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(
            np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for li, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks), 1):
        out_c = planes * 4
        for i in range(n):
            inn = in_c if i == 0 else out_c
            t = f"layer{li}.{i}"
            conv(f"{t}.conv1", planes, inn, 1)
            bn(f"{t}.bn1", planes)
            conv(f"{t}.conv2", planes, planes, 3)
            bn(f"{t}.bn2", planes)
            conv(f"{t}.conv3", out_c, planes, 1)
            bn(f"{t}.bn3", out_c)
            if i == 0:
                conv(f"{t}.downsample.0", out_c, inn, 1)
                bn(f"{t}.downsample.1", out_c)
        in_c = out_c
    sd["adpool.p"] = np.float32(2.7)
    sd["fc.weight"] = rng.standard_normal((out_dim, 2048)).astype(
        np.float32) * 0.02
    sd["fc.bias"] = rng.standard_normal(out_dim).astype(np.float32) * 0.01
    return sd


def _torch_gem_forward(sd, x_nhwc, blocks=BLOCKS):
    """Replay dirtorch ResNet_RMAC eval forward in torch functional."""
    import torch
    import torch.nn.functional as F

    from nerfloc_tpu.models.backbone import IMAGENET_MEAN, IMAGENET_STD

    t = lambda k: torch.tensor(sd[k])

    def bn(x, pre):
        return F.batch_norm(x, t(f"{pre}.running_mean"),
                            t(f"{pre}.running_var"), t(f"{pre}.weight"),
                            t(f"{pre}.bias"), training=False, eps=1e-5)

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x = torch.tensor(((x_nhwc - mean) / std).transpose(0, 3, 1, 2))
    x = F.relu(bn(F.conv2d(x, t("conv1.weight"), stride=2, padding=3), "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for li, n in enumerate(blocks, 1):
        for i in range(n):
            pre = f"layer{li}.{i}"
            stride = (1 if li == 1 else 2) if i == 0 else 1
            idt = x
            out = F.relu(bn(F.conv2d(x, t(f"{pre}.conv1.weight")),
                            f"{pre}.bn1"))
            out = F.relu(bn(F.conv2d(out, t(f"{pre}.conv2.weight"),
                                     stride=stride, padding=1), f"{pre}.bn2"))
            out = bn(F.conv2d(out, t(f"{pre}.conv3.weight")), f"{pre}.bn3")
            if f"{pre}.downsample.0.weight" in sd:
                idt = bn(F.conv2d(x, t(f"{pre}.downsample.0.weight"),
                                  stride=stride), f"{pre}.downsample.1")
            x = F.relu(out + idt)
    p = float(sd["adpool.p"])
    pooled = (x.clamp(min=1e-6) ** p).mean(dim=(2, 3)) ** (1.0 / p)
    out = pooled @ torch.tensor(sd["fc.weight"]).T + torch.tensor(sd["fc.bias"])
    return (out / out.norm(dim=1, keepdim=True)).numpy()


def test_port_parity_vs_torch_replica():
    pytest.importorskip("torch")
    import jax.numpy as jnp

    from nerfloc_tpu.retrieval.gem_weights import port_dirtorch_gem

    rng = np.random.default_rng(0)
    sd = _fake_dirtorch_sd(rng)
    module, variables = port_dirtorch_gem(sd)
    assert module.blocks == BLOCKS and module.out_dim == 32
    assert float(variables["params"]["p"]) == pytest.approx(2.7)

    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x)))
    ref = _torch_gem_forward(sd, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    # descriptors are unit-norm and batch entries differ
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=1e-5)
    assert np.abs(ours[0] - ours[1]).max() > 1e-4


def test_infer_blocks_resnet101_shape():
    from nerfloc_tpu.retrieval.gem_weights import infer_blocks

    sd = {f"layer{li}.{i}.conv1.weight": None
          for li, n in enumerate((3, 4, 23, 3), 1) for i in range(n)}
    assert infer_blocks(sd) == (3, 4, 23, 3)


def test_whiten_features_semantics():
    from nerfloc_tpu.retrieval.gem_weights import whiten_features

    try:
        from sklearn.decomposition import PCA
    except ImportError:
        pytest.skip("sklearn not installed")

    rng = np.random.default_rng(1)
    # anisotropic gaussian so PCA has distinct components
    basis = rng.standard_normal((16, 16)).astype(np.float32)
    data = (rng.standard_normal((200, 16)) * np.linspace(3, 0.1, 16)
            ).astype(np.float32) @ basis
    pca = PCA().fit(data)

    X = data[:5]
    out = whiten_features(X, pca, whitenp=0.25, whitenv=None, whitenm=1.0)
    assert out.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # whitenv truncates to the leading components
    out8 = whiten_features(X, pca, whitenv=8)
    assert out8.shape == (5, 8)
    np.testing.assert_allclose(
        out8 * np.linalg.norm(((X - pca.mean_) @ pca.components_[:8].T)
                              / pca.singular_values_[:8] ** 0.25,
                              axis=1, keepdims=True),
        ((X - pca.mean_) @ pca.components_[:8].T)
        / pca.singular_values_[:8] ** 0.25, rtol=1e-5)
    # the mean descriptor projects to zero (centering happened)
    z = whiten_features(pca.mean_[None], pca, l2norm=False)
    np.testing.assert_allclose(z, 0.0, atol=1e-4)
