"""Golden-value parity vs the reference torch modules — round-3 additions.

Covers the multiview aggregation core and matcher periphery (VERDICT round 2,
items 4 and 7):
  - fused_mean_variance                (reference ibrnet.py:8-12)
  - Projector.compute / compute_angle  (reference ibrnet.py:122-231)
  - IBRNet MultiHeadAttention          (reference ibrnet.py:69-119)
  - SelfCrossTransformer               (reference COTR/transformer.py:17-63)
  - AppearanceEmbedding / AdaptLayer   (reference appearance_embedding.py:17-67)
  - PositionEmbeddingSine              (reference COTR/position_encoding.py:53-80)
  - FineMatching expectation + losses  (reference matching/fine_matching.py:79-207;
    kornia is not installed here, so the dsnt spatial-expectation formula is
    inlined in torch — kornia.geometry.subpix.dsnt.spatial_expectation2d over
    a create_meshgrid(W, W, normalized=True) grid)

Weight-porting helpers mirror tests/test_golden_parity.py.
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
    return {"kernel": jnp.asarray(t_mod.weight.detach().numpy().T),
            "bias": jnp.asarray(t_mod.bias.detach().numpy())}


def _seq3(t_seq):
    lins = [m for m in t_seq if isinstance(m, torch.nn.Linear)]
    return {f"fc{i + 1}": _lin(m) for i, m in enumerate(lins)}


def _ln(t_mod):
    return {"scale": jnp.asarray(t_mod.weight.detach().numpy()),
            "bias": jnp.asarray(t_mod.bias.detach().numpy())}


def _torch_mha(t_mha, d, h):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention params."""
    dh = d // h
    W = t_mha.in_proj_weight.detach().numpy()   # [3d, d]
    b = t_mha.in_proj_bias.detach().numpy()

    def proj(i):
        return {"kernel": jnp.asarray(W[i * d:(i + 1) * d].T.reshape(d, h, dh)),
                "bias": jnp.asarray(b[i * d:(i + 1) * d].reshape(h, dh))}

    out_w = t_mha.out_proj.weight.detach().numpy()  # [d, d]
    return {"query": proj(0), "key": proj(1), "value": proj(2),
            "out": {"kernel": jnp.asarray(out_w.T.reshape(h, dh, d)),
                    "bias": jnp.asarray(t_mha.out_proj.bias.detach().numpy())}}


def _random_cameras(rng, V, H, W):
    """Simple inward-looking pinhole rigs around the origin."""
    Ks, c2ws = [], []
    for v in range(V):
        f = 80.0 + 10.0 * v
        K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]], np.float32)
        ang = 2 * np.pi * v / V + 0.3
        eye = np.array([2.5 * np.cos(ang), 0.4 * np.sin(2 * ang),
                        2.5 * np.sin(ang)], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([right, down, fwd], axis=1)
        c2w[:3, 3] = eye
        Ks.append(K)
        c2ws.append(c2w)
    return np.stack(Ks), np.stack(c2ws)


def test_fused_mean_variance():
    """reference ibrnet.py:8-12 (torch.jit.script) vs aggregator rebuild."""
    from nerf_loc.models.ibrnet.ibrnet import fused_mean_variance as t_fmv

    from nerfloc_tpu.models.fields.aggregator import fused_mean_variance

    rng = np.random.default_rng(20)
    x = rng.standard_normal((60, 5, 35)).astype(np.float32)
    w = rng.uniform(0.0, 1.0, (60, 5, 1)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    t_mean, t_var = t_fmv(torch.tensor(x), torch.tensor(w))
    j_mean, j_var = fused_mean_variance(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), **REF_TOL)
    np.testing.assert_allclose(np.asarray(j_var), t_var.numpy(), **REF_TOL)


def test_projector_compute_and_angle():
    """Projector.compute + compute_angle (reference ibrnet.py:144-231) vs
    projector.project_and_sample / compute_angle. Values compared under the
    validity mask (the reference's grid_sample pads out-of-bounds with zeros,
    ours clamps — consumers multiply by the mask either way, ibrnet.py:226)."""
    from nerf_loc.models.ibrnet.ibrnet import Projector as TorchProjector

    from nerfloc_tpu.models.fields.projector import (
        compute_angle,
        project_and_sample,
    )

    rng = np.random.default_rng(21)
    V, H, W, hf, wf, C, N = 4, 30, 40, 15, 20, 24, 300
    Ks, c2ws = _random_cameras(rng, V, H, W)
    images = rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32)
    featmaps = rng.standard_normal((V, hf, wf, C)).astype(np.float32)
    xyz = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
    query_pose = _random_cameras(rng, 1, H, W)[1][0]

    K4 = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    K4[:, :3, :3] = Ks
    with torch.no_grad():
        t_rgb, t_feat, t_ray, t_mask = TorchProjector().compute(
            torch.tensor(xyz), torch.tensor(K4), torch.tensor(c2ws),
            torch.tensor(images.transpose(0, 3, 1, 2)),
            torch.tensor(featmaps.transpose(0, 3, 1, 2)),
            query_extrinsic=torch.tensor(query_pose))

    j_rgb, j_feat, j_mask = project_and_sample(
        jnp.asarray(xyz), jnp.asarray(Ks), jnp.asarray(c2ws),
        jnp.asarray(images), jnp.asarray(featmaps))
    j_ray = compute_angle(jnp.asarray(xyz), jnp.asarray(query_pose),
                          jnp.asarray(c2ws)).transpose(1, 0, 2)

    m = t_mask.numpy()  # [N, V, 1]
    assert m.sum() > 0.2 * N * V, "fixture degenerate: too few valid samples"
    np.testing.assert_allclose(np.asarray(j_mask), m, **REF_TOL)
    np.testing.assert_allclose(np.asarray(j_rgb) * m, t_rgb.numpy() * m,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_feat) * m, t_feat.numpy() * m,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_ray), t_ray.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_ibrnet_multihead_attention():
    """IBRNet MultiHeadAttention (reference ibrnet.py:69-119) vs
    models.transformer.MultiHeadAttention — the neighbour-aggregation
    attention in ConditionalNeRF.query."""
    from nerf_loc.models.ibrnet.ibrnet import MultiHeadAttention as TorchMHA

    from nerfloc_tpu.models.transformer import MultiHeadAttention

    torch.manual_seed(22)
    n_head, d_model, d_k, d_v = 4, 32, 8, 8
    tmha = TorchMHA(n_head, d_model, d_k, d_v)
    tmha.eval()

    rng = np.random.default_rng(22)
    B, Lq, Lk = 6, 1, 9
    q = rng.standard_normal((B, Lq, d_model)).astype(np.float32)
    k = rng.standard_normal((B, Lk, d_model)).astype(np.float32)
    v = rng.standard_normal((B, Lk, d_model)).astype(np.float32)
    mask = (rng.uniform(size=(B, Lq, Lk)) > 0.3)
    mask[:, :, 0] = True  # keep at least one valid key per query

    def nobias_lin(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T)}

    params = {"params": {
        "w_qs": nobias_lin(tmha.w_qs), "w_ks": nobias_lin(tmha.w_ks),
        "w_vs": nobias_lin(tmha.w_vs), "fc": nobias_lin(tmha.fc),
        "layer_norm": _ln(tmha.layer_norm),
    }}
    jmha = MultiHeadAttention(n_head=n_head, d_model=d_model, d_k=d_k, d_v=d_v)

    with torch.no_grad():
        t_out, t_attn = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(v),
                             mask=torch.tensor(mask))
    j_out, j_attn = jmha.apply(params, jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(),
                               rtol=5e-4, atol=5e-5)

    # unmasked path too
    with torch.no_grad():
        t_out2, _ = tmha(torch.tensor(q), torch.tensor(k), torch.tensor(v))
    j_out2, _ = jmha.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(j_out2), t_out2.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_selfcross_transformer():
    """SelfCrossTransformer (reference COTR/transformer.py:17-63, post-norm
    DETR layers :171-250) vs models.transformer.SelfCrossTransformer."""
    from nerf_loc.models.COTR.transformer import (
        SelfCrossTransformer as TorchSCT,
    )

    from nerfloc_tpu.models.transformer import SelfCrossTransformer

    torch.manual_seed(23)
    d, h, ff = 48, 4, 96
    tsct = TorchSCT(d_model=d, nhead=h, dim_feedforward=ff, dropout=0.0)
    tsct.eval()

    rng = np.random.default_rng(23)
    B, N0, N1 = 2, 17, 23
    v0 = rng.standard_normal((B, N0, d)).astype(np.float32)
    v1 = rng.standard_normal((B, N1, d)).astype(np.float32)
    p0 = rng.standard_normal((B, N0, d)).astype(np.float32) * 0.3
    p1 = rng.standard_normal((B, N1, d)).astype(np.float32) * 0.3

    def enc_params(tl):
        return {"self_attn": _torch_mha(tl.self_attn, d, h),
                "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
                "norm1": _ln(tl.norm1), "norm2": _ln(tl.norm2)}

    def dec_params(tl):
        return {"cross_attn": _torch_mha(tl.multihead_attn, d, h),
                "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
                "norm2": _ln(tl.norm2), "norm3": _ln(tl.norm3)}

    params = {"params": {
        "self0": enc_params(tsct.self_attn_layer0),
        "self1": enc_params(tsct.self_attn_layer1),
        "cross0": dec_params(tsct.cross_attn_layer0),
        "cross1": dec_params(tsct.cross_attn_layer1),
    }}

    with torch.no_grad():
        t0, t1 = tsct(torch.tensor(v0), torch.tensor(p0),
                      torch.tensor(v1), torch.tensor(p1))

    jsct = SelfCrossTransformer(d_model=d, nhead=h, dim_feedforward=ff)
    j0, j1 = jsct.apply(params, jnp.asarray(v0), jnp.asarray(p0),
                        jnp.asarray(v1), jnp.asarray(p1))
    np.testing.assert_allclose(np.asarray(j0), t0.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j1), t1.numpy(), rtol=1e-3, atol=1e-4)


def test_appearance_embedding_and_adapt():
    """AppearanceEmbedding (mean||std of conv1 feats) + AppearanceAdaptLayer
    FiLM (reference appearance_embedding.py:17-67)."""
    import types
    from types import SimpleNamespace

    # torchvision is not installed; the reference module imports it at top
    # level (appearance_embedding.py:14, via backbone2d.py:11) but the
    # classes under test never touch it — stub it (plus the submodules the
    # import chain names) so the REAL reference classes load.
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.models = types.ModuleType("torchvision.models")
    mu = types.ModuleType("torchvision.models._utils")
    mu.IntermediateLayerGetter = object
    tv.models._utils = mu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("torchvision.models", tv.models)
    sys.modules.setdefault("torchvision.models._utils", mu)
    from nerf_loc.models.appearance_embedding import (
        AppearanceAdaptLayer as TorchAdapt,
        AppearanceEmbedding as TorchEmb,
    )

    from nerfloc_tpu.models.appearance import (
        AppearanceAdaptLayer,
        appearance_embedding,
    )

    torch.manual_seed(24)
    rng = np.random.default_rng(24)
    B, C, H, W = 3, 16, 8, 10
    feats = rng.standard_normal((B, C, H, W)).astype(np.float32)

    args = SimpleNamespace(appearance_emb_dim=2 * C)
    temb = TorchEmb(args)
    with torch.no_grad():
        t_emb = temb(None, {"conv1": torch.tensor(feats)}).numpy()
    j_emb = appearance_embedding(jnp.asarray(feats.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_emb), t_emb, **REF_TOL)

    input_dim = 12
    tadapt = TorchAdapt(args, input_dim, is_rgb=True)
    tadapt.eval()
    x = rng.uniform(-0.5, 1.5, (B, 6, 7, input_dim)).astype(np.float32)
    target = rng.standard_normal((1, 2 * C)).astype(np.float32)
    with torch.no_grad():
        t_y = tadapt(torch.tensor(x), torch.tensor(t_emb),
                     torch.tensor(target)).numpy()
    jadapt = AppearanceAdaptLayer(input_dim=input_dim, is_rgb=True)
    params = {"params": _seq3(tadapt.mlp)}
    j_y = jadapt.apply(params, jnp.asarray(x), j_emb, jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(j_y), t_y, rtol=5e-4, atol=5e-5)


def test_position_embedding_sine():
    """PositionEmbeddingSine lin_sine (reference position_encoding.py:53-80)
    vs geometry.embedder.position_embedding_sine."""
    from nerf_loc.models.COTR.position_encoding import (
        PositionEmbeddingSine as TorchPES,
    )

    from nerfloc_tpu.geometry.embedder import position_embedding_sine

    H, W, num_pos_feats = 12, 18, 64
    tpes = TorchPES(num_pos_feats, sine_type="lin_sine")
    with torch.no_grad():
        t_pos = tpes(torch.zeros(1, H, W))[0].numpy()  # [H, W, C]
    j_pos = position_embedding_sine(H, W, num_pos_feats)
    assert j_pos.shape == t_pos.shape
    np.testing.assert_allclose(np.asarray(j_pos), t_pos, **REF_TOL)


def _torch_fine_matching(feat_f0, feat_f1, mlps):
    """Torch replica of FineMatching.forward (reference fine_matching.py:94-143)
    with kornia's dsnt.spatial_expectation2d + create_meshgrid(W, W, True)
    inlined (kornia is not installed): grid_x/grid_y = linspace(-1, 1, W) along
    x (inner) / y (outer); expectation = sum(heatmap * grid)."""
    M, WW, C = feat_f1.shape
    W = int(WW ** 0.5)
    sim = torch.einsum("mc,mrc->mrc", feat_f0, feat_f1)
    sim = mlps(sim).squeeze(-1)                      # [M, WW]
    heat = torch.softmax(sim / C ** 0.5, dim=1)      # [M, WW]
    xs = torch.linspace(-1.0, 1.0, W)
    grid = torch.stack([xs.view(1, W).expand(W, W),   # x varies along inner dim
                        xs.view(W, 1).expand(W, W)], dim=-1).reshape(WW, 2)
    coords = heat @ grid                             # [M, 2]
    var = (grid ** 2 * heat.unsqueeze(-1)).sum(1) - coords ** 2
    std = torch.sqrt(torch.clamp(var, min=1e-10)).sum(-1)
    return torch.cat([coords, std.unsqueeze(1)], dim=-1)


def _torch_fine_loss(expec_f, expec_f_gt, loss_type, correct_thr):
    """Torch replica of FineMatching losses (fine_matching.py:155-199)."""
    correct = torch.linalg.norm(expec_f_gt, ord=float("inf"), dim=1) < correct_thr
    if loss_type == "l2":
        off = ((expec_f_gt[correct] - expec_f[correct, :2]) ** 2).sum(-1)
        return off.mean()
    std = expec_f[:, 2]
    inv_std = 1.0 / torch.clamp(std, min=1e-10)
    weight = (inv_std / torch.mean(inv_std)).detach()
    off = ((expec_f_gt[correct] - expec_f[correct, :2]) ** 2).sum(-1)
    return (off * weight[correct]).mean()


def test_fine_matching_expectation_and_losses():
    """FineMatching expectation head + l2/l2_with_std losses vs the torch
    replica (reference fine_matching.py:94-207; kornia dsnt inlined)."""
    from nerfloc_tpu.models.matching import (
        FineMatching,
        fine_loss_l2,
        fine_loss_l2_std,
    )

    torch.manual_seed(25)
    rng = np.random.default_rng(25)
    M, W, C = 30, 7, 20
    WW = W * W
    mlps = torch.nn.Sequential(
        torch.nn.Linear(C, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 1))
    mlps.eval()

    f0 = rng.standard_normal((M, C)).astype(np.float32) * 0.5
    f1 = rng.standard_normal((M, WW, C)).astype(np.float32) * 0.5
    with torch.no_grad():
        t_expec = _torch_fine_matching(torch.tensor(f0), torch.tensor(f1), mlps)

    jfm = FineMatching()
    params = {"params": {"mlps": _seq3(mlps)}}
    j_expec = jfm.apply(params, jnp.asarray(f0), jnp.asarray(f1))
    np.testing.assert_allclose(np.asarray(j_expec), t_expec.numpy(),
                               rtol=5e-4, atol=5e-5)

    # loss parity: mix of correct (inf-norm < thr) and incorrect gt offsets
    gt = rng.uniform(-1.6, 1.6, (M, 2)).astype(np.float32)
    thr = 1.0
    assert 0 < np.sum(np.max(np.abs(gt), 1) < thr) < M
    ones = jnp.ones((M,), bool)
    with torch.no_grad():
        t_l2 = _torch_fine_loss(t_expec, torch.tensor(gt), "l2", thr).item()
        t_l2s = _torch_fine_loss(t_expec, torch.tensor(gt), "l2_with_std",
                                 thr).item()
    j_l2 = float(fine_loss_l2(j_expec, jnp.asarray(gt), ones, thr))
    j_l2s = float(fine_loss_l2_std(j_expec, jnp.asarray(gt), ones, thr))
    np.testing.assert_allclose(j_l2, t_l2, rtol=1e-4)
    np.testing.assert_allclose(j_l2s, t_l2s, rtol=1e-4)
