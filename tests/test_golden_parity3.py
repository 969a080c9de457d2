"""Golden-value parity vs the reference torch DepthFusionNet / ResEncoder.

The reference's depth_fusion.py imports `inplace_abn` (absent here) but never
uses it — `ABN` at depth_fusion.py:5 is a dead import — so the module becomes
importable by stubbing that package. This closes the one golden the round-2
VERDICT listed as blocked: the full NeuRay support-view ray-feature extractor
(cross-view reprojection diff features + reflect-padded InstanceNorm ResUNet +
depth skip; reference depth_fusion.py:150-282, neuray_ops.py:88-239) vs the
JAX rebuild in models/fields/neuray.py with ported weights.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/reference")
# dead import at reference depth_fusion.py:5 — ABN is never referenced
if "inplace_abn" not in sys.modules:
    sys.modules["inplace_abn"] = types.SimpleNamespace(ABN=torch.nn.BatchNorm2d)


def _A(t):
    return np.asarray(t.detach().numpy())


def _conv(sd, p, bias=False):
    """torch Conv2d -> RConv subtree ({Conv_0: {kernel[, bias]}})."""
    d = {"kernel": jnp.asarray(_A(sd[p + ".weight"]).transpose(2, 3, 1, 0))}
    if bias:
        d["bias"] = jnp.asarray(_A(sd[p + ".bias"]))
    return {"Conv_0": d}


def _plainconv(sd, p):
    """torch Conv2d -> bare flax nn.Conv params (kernel + bias)."""
    return {"kernel": jnp.asarray(_A(sd[p + ".weight"]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_A(sd[p + ".bias"]))}


def _inorm(sd, p):
    return {"scale": jnp.asarray(_A(sd[p + ".weight"])),
            "bias": jnp.asarray(_A(sd[p + ".bias"]))}


def _convin(sd, p):
    """reference `conv` module (conv+InstanceNorm+ELU) -> ConvIN subtree."""
    return {"conv": _conv(sd, p + ".conv", bias=True), "bn": _inorm(sd, p + ".bn")}


def _basic_block(sd, p, downsample):
    d = {"conv1": _conv(sd, p + ".conv1"), "bn1": _inorm(sd, p + ".bn1"),
         "conv2": _conv(sd, p + ".conv2"), "bn2": _inorm(sd, p + ".bn2")}
    if downsample:
        d["ds_conv"] = _conv(sd, p + ".downsample.0")
        d["ds_bn"] = _inorm(sd, p + ".downsample.1")
    return d


def _port_fuse_net(sd, prefix="fuse_net"):
    p = {"conv1": {"kernel": jnp.asarray(
            _A(sd[f"{prefix}.conv1.weight"]).transpose(2, 3, 1, 0))},
         "bn1": _inorm(sd, f"{prefix}.bn1")}
    for L in (1, 2, 3):
        for i in (0, 1):
            p[f"layer{L}_{i}"] = _basic_block(
                sd, f"{prefix}.layer{L}.{i}", downsample=(i == 0))
    for name in ("upconv3", "upconv2"):
        p[name] = _convin(sd, f"{prefix}.{name}.conv")
    for name in ("iconv3", "iconv2"):
        p[name] = _convin(sd, f"{prefix}.{name}")
    p["out_conv"] = _plainconv(sd, f"{prefix}.out_conv")
    return p


@pytest.fixture(scope="module")
def ref_dfn():
    from nerf_loc.models.conditional_nerf.depth_fusion import (
        DepthFusionNet as TorchDFN,
    )

    torch.manual_seed(3)
    net = TorchDFN({})
    # InstanceNorm affine params initialize to (1, 0); perturb them so the
    # parity check exercises the scale/bias port too
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "bn" in name or "downsample.1" in name:
                p.add_(torch.randn_like(p) * 0.05)
    net.eval()
    return net


def _scene(V, H, W, seed):
    """random-but-consistent multiview RGB-D inputs."""
    rng = np.random.RandomState(seed)
    imgs = rng.rand(V, 3, H, W).astype(np.float32)
    depths = (1.0 + 3.0 * rng.rand(V, H, W)).astype(np.float32)
    Ks = np.tile(np.array([[0.9 * W, 0.0, W / 2],
                           [0.0, 0.9 * W, H / 2],
                           [0.0, 0.0, 1.0]], np.float32), (V, 1, 1))
    c2ws = []
    for v in range(V):
        ang = 0.15 * (v - (V - 1) / 2)
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([0.3 * v, 0.05 * v, -0.1 * v], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        c2ws.append(T)
    return imgs, depths, Ks, np.stack(c2ws), np.float32(0.5), np.float32(5.0)


@pytest.mark.parametrize("hw", [(34, 34), (66, 66)])
def test_depth_fusion_net_golden(ref_dfn, hw):
    """Full DepthFusionNet forward (diff feats + ResUNet + depth skip).

    Sizes are chosen so every decoder upsample lands exactly on its skip:
    for any other size (e.g. 38x38 or 40x40) the REFERENCE itself crashes —
    skipconnect pads the skip up to the overshot upsample size, so the
    final feature map outgrows the depth_skip branch and the concat at
    depth_fusion.py:282 fails. The rebuild stays well-defined there (see
    test_depth_fusion_odd_sizes)."""
    from nerfloc_tpu.models.fields.neuray import DepthFusionNet

    H, W = hw
    imgs, depths, Ks, c2ws, near, far = _scene(3, H, W, seed=H)

    with torch.no_grad():
        ref = ref_dfn(
            torch.from_numpy(imgs), None, torch.from_numpy(depths),
            torch.from_numpy(Ks), torch.from_numpy(c2ws),
            torch.tensor([near, far]),
        )  # [V, 32, H', W']
    ref = _A(ref).transpose(0, 2, 3, 1)

    sd = ref_dfn.state_dict()
    params = {"params": {
        "fuse_net": _port_fuse_net(sd),
        "depth_skip1": _plainconv(sd, "depth_skip.0"),
        "depth_skip2": _plainconv(sd, "depth_skip.2"),
        "conv_out": _plainconv(sd, "conv_out"),
    }}
    model = DepthFusionNet()
    out = model.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                      jnp.asarray(depths), jnp.asarray(Ks), jnp.asarray(c2ws),
                      jnp.float32(near), jnp.float32(far))
    out = np.asarray(out)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_depth_fusion_odd_sizes():
    """Rebuild-only: sizes where the decoder upsample overshoots the skips
    (the reference crashes here, see above) still produce a well-formed
    output aligned to the depth-skip grid."""
    import jax

    from nerfloc_tpu.models.fields.neuray import DepthFusionNet

    imgs, depths, Ks, c2ws, near, far = _scene(2, 40, 40, seed=40)
    model = DepthFusionNet()
    args = (jnp.asarray(imgs.transpose(0, 2, 3, 1)), jnp.asarray(depths),
            jnp.asarray(Ks), jnp.asarray(c2ws), jnp.float32(near),
            jnp.float32(far))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert out.shape[0] == 2 and out.shape[-1] == 32
    assert np.isfinite(np.asarray(out)).all()


def test_res_encoder_golden(ref_dfn):
    """ResEncoder alone on a raw 12-channel input (neuray_ops.py:152-239) —
    isolates the conv/norm/upsample stack from the projection math."""
    from nerfloc_tpu.models.fields.neuray import ResEncoder

    rng = np.random.RandomState(7)
    x = rng.randn(2, 12, 34, 34).astype(np.float32)
    with torch.no_grad():
        ref = ref_dfn.fuse_net(torch.from_numpy(x))
    ref = _A(ref).transpose(0, 2, 3, 1)

    sd = ref_dfn.state_dict()
    params = {"params": _port_fuse_net(sd)}
    out = ResEncoder().apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)
