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
