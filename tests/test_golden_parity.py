"""Golden-value parity vs the reference torch modules.

The only drift insurance available without datasets (VERDICT round 1, item 4):
fixed random inputs are pushed through the reference's torch modules at
/root/reference and through the JAX rebuilds with ported weights; outputs
must agree to float tolerance.

Covered here: MixtureLogisticsDistDecoder (forward + compute_visibility +
compute_prob), S2DMatching (score matrix + mutual-NN selection + focal loss),
sample_pdf (det), RayUnet. The multiview core (Projector, fused_mean_variance,
IBRNet MHA, SelfCrossTransformer), appearance adaptation, sine position
embedding, and the fine-matching expectation head live in
tests/test_golden_parity2.py.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/reference")

REF_TOL = dict(rtol=2e-4, atol=2e-5)


def _lin(t_mod):
    """torch Linear -> flax Dense params."""
    return {"kernel": jnp.asarray(t_mod.weight.detach().numpy().T),
            "bias": jnp.asarray(t_mod.bias.detach().numpy())}


def _seq3(t_seq):
    """torch Sequential(Linear, act, Linear, act, Linear, ...) -> fc1..fc3."""
    lins = [m for m in t_seq if isinstance(m, torch.nn.Linear)]
    return {f"fc{i + 1}": _lin(m) for i, m in enumerate(lins)}


@pytest.fixture(scope="module")
def ref_decoder():
    from nerf_loc.models.conditional_nerf.visibility_decoder import (
        MixtureLogisticsDistDecoder as TorchDecoder,
    )

    torch.manual_seed(0)
    tdec = TorchDecoder({})
    tdec.eval()
    return tdec


@pytest.fixture(scope="module")
def jax_decoder_params(ref_decoder):
    return {"params": {
        "mean_decoder": _seq3(ref_decoder.mean_decoder),
        "var_decoder": _seq3(ref_decoder.var_decoder),
        "vis_decoder": _seq3(ref_decoder.vis_decoder),
        "aw_decoder": _seq3(ref_decoder.aw_decoder),
    }}


def test_dist_decoder_forward(ref_decoder, jax_decoder_params):
    from nerfloc_tpu.models.fields.neuray import MixtureLogisticsDistDecoder

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 50, 32)).astype(np.float32)
    with torch.no_grad():
        t_mean, t_var, t_vis, t_aw = ref_decoder(torch.tensor(feats))

    jdec = MixtureLogisticsDistDecoder()
    mean, var, vis, aw = jdec.apply(jax_decoder_params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(mean), t_mean.numpy(), **REF_TOL)
    np.testing.assert_allclose(np.asarray(var), t_var.numpy(), **REF_TOL)
    np.testing.assert_allclose(np.asarray(vis), t_vis.numpy(), **REF_TOL)
    np.testing.assert_allclose(np.asarray(aw), t_aw.numpy(), **REF_TOL)


def test_compute_visibility(ref_decoder):
    """reference visibility_decoder.py:109-138 vs neuray.compute_visibility."""
    from nerfloc_tpu.models.fields import neuray

    rng = np.random.default_rng(2)
    V, N = 4, 200
    depth = rng.uniform(0.3, 5.0, (V, N, 1)).astype(np.float32)
    mean = rng.uniform(0.0, 1.0, (V, N, 2)).astype(np.float32)
    var = rng.uniform(0.1, 3.0, (V, N, 2)).astype(np.float32)
    vis = rng.uniform(0.0, 1.0, (V, N, 1)).astype(np.float32)
    aw = rng.uniform(0.0, 1.0, (V, N, 1)).astype(np.float32)
    near, far = 0.5, 4.0
    depth_range = torch.tensor(np.tile([[near, far]], (V, 1)).astype(np.float32))

    with torch.no_grad():
        t_out = ref_decoder.compute_visibility(
            torch.tensor(depth), torch.tensor(mean), torch.tensor(var),
            torch.tensor(vis), torch.tensor(aw), depth_range).numpy()

    # the reference clamps depth to >= 1e-5 before inverting; ours expects
    # positive depths (positive here by construction)
    j_out = neuray.compute_visibility(
        jnp.asarray(depth), jnp.asarray(mean), jnp.asarray(var),
        jnp.asarray(vis), jnp.asarray(aw), jnp.float32(near), jnp.float32(far))
    np.testing.assert_allclose(np.asarray(j_out), t_out, **REF_TOL)


def test_compute_prob_alpha(ref_decoder):
    """reference compute_prob(is_ref=True) vs neuray.compute_alpha_prob."""
    from nerfloc_tpu.models.fields import neuray

    rng = np.random.default_rng(3)
    V, RN, DN = 3, 16, 12
    near, far = 0.5, 4.0
    # sorted positive sample depths per ray
    depth = np.sort(rng.uniform(0.6, 3.8, (V, RN, DN)).astype(np.float32), -1)
    interval = rng.uniform(0.01, 0.1, (V, RN, DN)).astype(np.float32)
    mean = rng.uniform(0.0, 1.0, (V, RN, DN, 2)).astype(np.float32)
    var = rng.uniform(0.1, 3.0, (V, RN, DN, 2)).astype(np.float32)
    vis = rng.uniform(0.0, 1.0, (V, RN, DN, 1)).astype(np.float32)
    aw = rng.uniform(0.0, 1.0, (V, RN, DN, 1)).astype(np.float32)
    depth_range = torch.tensor(np.tile([[near, far]], (V, 1)).astype(np.float32))

    with torch.no_grad():
        # reference shapes: [rfn, qn, rn, dn] — insert qn=1
        t_alpha, t_vis, t_hit = ref_decoder.compute_prob(
            torch.tensor(depth[:, None]), torch.tensor(interval[:, None]),
            torch.tensor(mean[:, None]), torch.tensor(var[:, None]),
            torch.tensor(vis[:, None]), torch.tensor(aw[:, None]),
            True, depth_range)

    j_alpha, j_vis, j_hit = neuray.compute_alpha_prob(
        jnp.asarray(depth), jnp.asarray(interval), jnp.asarray(mean),
        jnp.asarray(var), jnp.asarray(vis), jnp.asarray(aw),
        jnp.float32(near), jnp.float32(far))
    np.testing.assert_allclose(np.asarray(j_vis), t_vis[:, 0].numpy(), **REF_TOL)
    np.testing.assert_allclose(np.asarray(j_hit), t_hit[:, 0].numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_alpha), t_alpha[:, 0].numpy(),
                               rtol=5e-3, atol=5e-3)  # log amplifies eps noise


def test_sample_pdf_det():
    from nerf_loc.models.conditional_nerf.utils import sample_pdf as t_sample_pdf

    from nerfloc_tpu.models.fields.conditional_nerf import sample_pdf_det

    rng = np.random.default_rng(4)
    R, M = 20, 31
    bins = np.sort(rng.uniform(0.5, 4.0, (R, M + 1)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (R, M)).astype(np.float32)
    weights[3] = 0.0  # degenerate ray
    with torch.no_grad():
        t_out = t_sample_pdf(torch.tensor(bins), torch.tensor(weights), 17,
                             det=True).numpy()
    j_out = sample_pdf_det(jnp.asarray(bins), jnp.asarray(weights), 17)
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-4)


def test_s2d_matching(ref_decoder):
    from nerf_loc.models.matching.sparse_to_dense import S2DMatching as TorchS2D

    from nerfloc_tpu.models.matching import (
        S2DMatching,
        coarse_loss,
        mutual_nearest_matches,
    )

    torch.manual_seed(5)
    C, N, M = 48, 40, 90
    ts2d = TorchS2D(feat_dim=C, thr=0.2)
    ts2d.eval()

    rng = np.random.default_rng(5)
    d3 = rng.standard_normal((N, C)).astype(np.float32) * 0.5
    d2 = rng.standard_normal((M, C)).astype(np.float32) * 0.5
    data = {}
    with torch.no_grad():
        ts2d(torch.tensor(d3), torch.tensor(d2), data)
    t_scores = data["score_matrix"].numpy()
    t_pairs = set(zip(data["i_ids"].numpy().tolist(),
                      data["j_ids"].numpy().tolist()))

    js2d = S2DMatching(thr=0.2, row_tile=16)
    params = {"params": {"mlps": _seq3(ts2d.mlps)}}
    conf = js2d.apply(params, jnp.asarray(d3), jnp.asarray(d2))
    scores = jax.nn.sigmoid(conf)
    np.testing.assert_allclose(np.asarray(scores), t_scores, **REF_TOL)

    match_j, match_mask = mutual_nearest_matches(scores, 0.2)
    j_pairs = {(i, int(match_j[i])) for i in range(N) if bool(match_mask[i])}
    assert j_pairs == t_pairs

    # focal loss parity on a random GT assignment
    gt = (rng.uniform(size=(N, M)) > 0.98).astype(np.float32)
    with torch.no_grad():
        t_loss = ts2d.get_loss(torch.tensor(np.asarray(conf)),
                               torch.tensor(gt)).item()
    j_loss = float(coarse_loss(conf, jnp.asarray(gt)))
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-4)


def test_ray_unet():
    from nerf_loc.models.conditional_nerf.ray_unet import RayUnet as TorchRayUnet

    from nerfloc_tpu.models.fields.ray_unet import RayUnet

    torch.manual_seed(6)
    C, S, R = 24, 16, 7
    tnet = TorchRayUnet(C, S)
    tnet.eval()

    rng = np.random.default_rng(6)
    x = rng.standard_normal((R, C, S)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.tensor(x)).numpy()  # [R, C, S]

    def conv1d(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 1, 0)),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def tconv1d(m):
        # torch ConvTranspose1d(3, stride 2, padding 1, output_padding 1)
        # == flax ConvTranspose(padding=((1,2),)) with the spatially FLIPPED
        # [k, in, out] kernel (see ray_unet.py ConvBlock)
        w = m.weight.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        return {"kernel": jnp.asarray(w),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def ln(m):
        # torch LayerNorm([C, S]) affine [C, S] -> ours is [S, C]
        return {"scale": jnp.asarray(m.weight.detach().numpy().T),
                "bias": jnp.asarray(m.bias.detach().numpy().T)}

    def block(t_seq, transpose=False):
        conv = tconv1d(t_seq[0]) if transpose else conv1d(t_seq[0])
        return {"conv": conv, "ln": ln(t_seq[1])}

    params = {"params": {
        "conv1": block(tnet.conv1), "conv2": block(tnet.conv2),
        "conv3": block(tnet.conv3),
        "trans_conv3": block(tnet.trans_conv3, True),
        "trans_conv2": block(tnet.trans_conv2, True),
        "trans_conv1": block(tnet.trans_conv1, True),
        "conv_out": block(tnet.conv_out),
    }}
    jnet = RayUnet(C, S)
    j_out = jnet.apply(params, jnp.asarray(x.transpose(0, 2, 1)))  # [R, S, C]
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 2, 1), t_out,
                               rtol=5e-4, atol=5e-4)
