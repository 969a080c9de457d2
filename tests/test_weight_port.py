"""torch->flax weight porting: structural + numerical parity.

torchvision is not in the image, so a torchvision-shaped state dict is
synthesized; torch core validates the conv/BN math numerically.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from tools.port_torch_weights import port_resnet50_trunk, resnet50_trunk_maps


def _fake_resnet50_sd(rng):
    """torchvision-style resnet50 state dict (conv1..layer2), random."""
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
    spec = {"layer1": (64, 256, 3, 64), "layer2": (128, 512, 4, 256)}
    for layer, (planes, out, n, in0) in spec.items():
        for i in range(n):
            inn = in0 if i == 0 else out
            conv(f"{layer}.{i}.conv1", planes, inn, 1)
            bn(f"{layer}.{i}.bn1", planes)
            conv(f"{layer}.{i}.conv2", planes, planes, 3)
            bn(f"{layer}.{i}.bn2", planes)
            conv(f"{layer}.{i}.conv3", out, planes, 1)
            bn(f"{layer}.{i}.bn3", out)
            if i == 0:
                conv(f"{layer}.{i}.downsample.0", out, inn, 1)
                bn(f"{layer}.{i}.downsample.1", out)
    return sd


def test_port_into_backbone_and_forward():
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.models.backbone import Backbone2D

    rng = np.random.default_rng(0)
    sd = _fake_resnet50_sd(rng)

    model = Backbone2D(fpn_dim=16)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    v2 = {"params": variables["params"], "frozen": variables["frozen"]}
    ported = port_resnet50_trunk(sd, v2, trunk_path=("trunk",))

    # ported kernels actually landed (flax init != torch values)
    k_flax = np.asarray(ported["params"]["trunk"]["conv1"]["kernel"])
    np.testing.assert_allclose(k_flax,
                               np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    out = model.apply(ported, x)
    assert np.isfinite(np.asarray(out["layer2"])).all()


def test_conv_bn_numerics_vs_torch():
    """First conv+frozen-BN of the trunk matches torch's conv2d+batch_norm."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.models.backbone import ResNet50Trunk

    rng = np.random.default_rng(1)
    sd = _fake_resnet50_sd(rng)
    x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)

    trunk = ResNet50Trunk()
    variables = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, frozen = resnet50_trunk_maps(sd)
    out = trunk.apply({"params": {**variables["params"], **params},
                       "frozen": {**variables["frozen"], **frozen}},
                      jnp.asarray(x))
    conv1 = np.asarray(out["conv1"])  # after imagenet-norm, conv, bn, relu

    # torch reference for the same pipeline
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.tensor(((x - mean) / std).transpose(0, 3, 1, 2))
    w = torch.tensor(sd["conv1.weight"])
    y = torch.nn.functional.conv2d(xt, w, stride=2, padding=3)
    y = torch.nn.functional.batch_norm(
        y, torch.tensor(sd["bn1.running_mean"]),
        torch.tensor(sd["bn1.running_var"]),
        torch.tensor(sd["bn1.weight"]), torch.tensor(sd["bn1.bias"]),
        training=False, eps=1e-5)
    y = torch.relu(y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(conv1, y, rtol=1e-3, atol=1e-4)


def _fake_fpn_sd(rng, fpn_dim=16):
    """torchvision FeaturePyramidNetwork v2 names for [layer1, layer2]."""
    sd = {}
    for i, in_c in enumerate((256, 512)):
        sd[f"fpn.inner_blocks.{i}.0.weight"] = (
            rng.standard_normal((fpn_dim, in_c, 1, 1)).astype(np.float32) * 0.05)
        sd[f"fpn.layer_blocks.{i}.0.weight"] = (
            rng.standard_normal((fpn_dim, fpn_dim, 3, 3)).astype(np.float32) * 0.05)
    return sd


def test_port_full_cotr_checkpoint():
    """Full Backbone2D (trunk + FPN) from a COTR-shaped state dict."""
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.models.backbone import Backbone2D
    from tools.port_torch_weights import port_cotr_checkpoint

    rng = np.random.default_rng(7)
    trunk_sd = _fake_resnet50_sd(rng)
    fpn_sd = _fake_fpn_sd(rng)
    # COTR checkpoint layout: Joiner wraps the backbone as 'backbone.0.',
    # the trunk lives under 'body.' (backbone2d.py:147)
    model_sd = {f"backbone.0.body.{k}": v for k, v in trunk_sd.items()}
    model_sd.update({f"backbone.0.{k}": v for k, v in fpn_sd.items()})
    model_sd["transformer.ignored.weight"] = np.zeros(3, np.float32)

    model = Backbone2D(fpn_dim=16)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ported = port_cotr_checkpoint(model_sd, dict(variables),
                                  backbone_path=())

    k = np.asarray(ported["params"]["fpn"]["inner_layer1"]["kernel"])
    np.testing.assert_allclose(
        k, np.transpose(fpn_sd["fpn.inner_blocks.0.0.weight"], (2, 3, 1, 0)))
    out = model.apply(ported, x)
    assert out["layer1"].shape[-1] == 16 and out["layer2"].shape[-1] == 16
    assert np.isfinite(np.asarray(out["layer1"])).all()


def test_fpn_numerics_vs_torch():
    """FPN forward (inner 1x1 + InstanceNorm, top-down nearest upsample,
    layer 3x3 + InstanceNorm) matches a torch replica of torchvision's
    FeaturePyramidNetwork with norm_layer=InstanceNorm2d (fpn.py:131-300)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from nerfloc_tpu.models.backbone import FPN

    rng = np.random.default_rng(8)
    fpn_dim = 8
    f1 = rng.standard_normal((1, 16, 16, 12)).astype(np.float32)
    f2 = rng.standard_normal((1, 8, 8, 20)).astype(np.float32)
    w_in1 = rng.standard_normal((fpn_dim, 12, 1, 1)).astype(np.float32) * 0.3
    w_in2 = rng.standard_normal((fpn_dim, 20, 1, 1)).astype(np.float32) * 0.3
    w_l1 = rng.standard_normal((fpn_dim, fpn_dim, 3, 3)).astype(np.float32) * 0.3
    w_l2 = rng.standard_normal((fpn_dim, fpn_dim, 3, 3)).astype(np.float32) * 0.3

    def t_in(x, w):
        y = torch.nn.functional.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                                       torch.tensor(w))
        return torch.nn.functional.instance_norm(y)

    lat1, lat2 = t_in(f1, w_in1), t_in(f2, w_in2)
    up = torch.nn.functional.interpolate(lat2, size=lat1.shape[-2:],
                                         mode="nearest")
    r1 = lat1 + up

    def t_layer(x, w):
        y = torch.nn.functional.conv2d(x, torch.tensor(w), padding=1)
        return torch.nn.functional.instance_norm(y).permute(0, 2, 3, 1).numpy()

    ref1, ref2 = t_layer(r1, w_l1), t_layer(lat2, w_l2)

    fpn = FPN(out_channels=fpn_dim)
    params = {"params": {
        "inner_layer1": {"kernel": jnp.asarray(w_in1.transpose(2, 3, 1, 0))},
        "inner_layer2": {"kernel": jnp.asarray(w_in2.transpose(2, 3, 1, 0))},
        "layer_layer1": {"kernel": jnp.asarray(w_l1.transpose(2, 3, 1, 0))},
        "layer_layer2": {"kernel": jnp.asarray(w_l2.transpose(2, 3, 1, 0))},
    }}
    out = fpn.apply(params, {"layer1": jnp.asarray(f1), "layer2": jnp.asarray(f2)})
    np.testing.assert_allclose(np.asarray(out["layer1"]), ref1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["layer2"]), ref2, rtol=1e-3, atol=1e-4)
