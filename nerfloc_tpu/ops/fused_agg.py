"""Fused neighbor-aggregation kernel (Pallas TPU).

Fuses the per-sample tail of ConditionalNeRF.query (conditional_nerf.py
query(): offsets -> frequency embedding -> ray_diff MLP -> base_mlp ->
Lq=1 multi-head attention -> LayerNorm) into ONE VMEM-resident pass over
sample tiles. The XLA graph materializes ~8 HBM round trips of [N*K, 128]
intermediates for this segment (embedder + base_mlp + attention measured
~32ms of the 102ms render call at 2.1M neighbor rows on v5e); the kernel's
HBM traffic is just the gathered inputs once in and [N, W] once out.

Replaces no reference component 1:1 — it is the TPU-native fusion of
reference model.py:396-414 (agg_net + base attention), exact same math.

Backward: jax.custom_vjp whose bwd replays the pure-JAX reference
implementation (`reference_agg`) and differentiates that — the kernel is
forward-only, training gets correct gradients at unfused speed (same
recompute-style tradeoff as jax.checkpoint).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

N_HEAD, D_K = 4, 32
LN_EPS = 1e-6          # flax nn.LayerNorm default
LEAK = 0.01            # nn.leaky_relu default


def _leaky(x):
    # max(x, a*x) == leaky_relu for a<1; avoids a compare, which Mosaic
    # cannot lower for bf16 vectors ("Target does not support this
    # comparison" on arith.cmpf bf16)
    return jnp.maximum(x, LEAK * x)


def _emb_perm(F: int, feat_dim: int, rdfc_dim: int) -> Tuple[int, ...]:
    """Row permutation taking base_mlp fc0's kernel from the flax input
    layout [feat | x | sin f0 | cos f0 | sin f1 | ...] to the kernel's
    assembly order [feat | x | sin f0..fF | cos f0..fF | rdfc]."""
    rows = list(range(feat_dim))                     # feature block
    base = feat_dim
    rows += [base + d for d in range(3)]             # identity x
    for trig in (0, 1):                              # sin block then cos block
        for k in range(F):
            rows += [base + 3 + 6 * k + 3 * trig + d for d in range(3)]
    base2 = feat_dim + 3 + 6 * F
    rows += [base2 + d for d in range(rdfc_dim)]     # rdfc block
    return tuple(rows)


def _kernel(mv_ref, off_ref, rdiff_ref, nbf_ref,
            bmat, hmat, rd_w1, rd_b1, rd_w2, rd_b2,
            w_feat, w_off, w_sin, w_cos, w_rdfc, b_b0, b_w1, b_b1, b_w2, b_b2,
            a_wq, a_wk, a_wv, a_wfc, ln_s, ln_b,
            out_ref, *, dt):
    """Row-flattened formulation: the whole MLP chain runs on [T*K, .]
    matrices; only the softmax tail loops over K.

    Mosaic constraints probed on v5e: rank-expanding broadcasts and
    lane-concats of differently-padded producers do NOT compile; collapse
    reshapes (T,K,C)->(T*K,C) and their inverse, [:, k, :] static middle
    slices, indicator-matrix matmuls ([T,W]@[W,4], [T,4]@[4,W]) and f32
    sin/exp DO. So:
      * off/ray_diff come pre-computed from XLA (broadcast happens there),
      * the frequency embedding is off @ B (B block-diagonal band scales,
        f32 for phase accuracy) followed by elementwise sin/cos and two
        wide matmuls against w_sin/w_cos [3F, W],
      * fc0's input concat becomes a sum of per-block matmuls,
      * per-head attention scores are lane reductions via the indicator
        matrix H [W, H] (H.T broadcasts [T,H] scores back to [T, W]).
    v1 (per-neighbor unrolled) ran 108ms at render scale because every one
    of its ~15*K thin matmuls is row-bound on the MXU; this layout does 11
    [T*K]-row matmuls total."""
    T, K, Fdim = nbf_ref.shape
    (bmat, hmat, rd_w1, rd_b1, rd_w2, rd_b2, w_feat, w_off, w_sin, w_cos,
     w_rdfc, b_b0, b_w1, b_b1, b_w2, b_b2, a_wq, a_wk, a_wv, a_wfc,
     ln_s, ln_b) = (
        r[...] for r in (bmat, hmat, rd_w1, rd_b1, rd_w2, rd_b2, w_feat,
                         w_off, w_sin, w_cos, w_rdfc, b_b0, b_w1, b_b1,
                         b_w2, b_b2, a_wq, a_wk, a_wv, a_wfc, ln_s, ln_b))

    def mm(x, w, b=None):
        y = jnp.dot(x.astype(dt), w.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
        return y if b is None else y + b.astype(dt)

    mv = mv_ref[...].astype(dt)                        # [T, W]
    off = off_ref[...].reshape(T * K, 3)               # f32 (phase accuracy)
    rdiff = rdiff_ref[...].reshape(T * K, 4)
    nbf = nbf_ref[...].reshape(T * K, Fdim)

    # frequency embedding: band-scaled offsets in ONE f32 matmul, then
    # elementwise sin/cos at [T*K, 3F]
    offw = jnp.dot(off, bmat, preferred_element_type=jnp.float32)
    h0 = (mm(nbf, w_feat) + mm(off, w_off)
          + mm(jnp.sin(offw), w_sin) + mm(jnp.cos(offw), w_cos))

    h1 = _leaky(mm(rdiff, rd_w1, rd_b1))
    rdfc = _leaky(mm(h1, rd_w2, rd_b2))

    h = _leaky(h0 + mm(rdfc, w_rdfc) + b_b0.astype(dt))
    h = _leaky(mm(h, b_w1, b_b1))
    pf = _leaky(mm(h, b_w2, b_b2))                     # [T*K, W]

    kk = mm(pf, a_wk).reshape(T, K, -1)
    vv = mm(pf, a_wv).reshape(T, K, -1)
    q = mm(mv, a_wq) * dt(1.0 / (D_K ** 0.5))          # [T, W]

    # per-head scores via indicator reduction; explicit max-subtracted
    # softmax over the K python-loop
    s4s = [jnp.dot((q * kk[:, k, :]).astype(dt), hmat,
                   preferred_element_type=jnp.float32) for k in range(K)]
    m = s4s[0]
    for k in range(1, K):
        m = jnp.maximum(m, s4s[k])                     # [T, H] f32
    den = jnp.zeros_like(m)
    num = None
    for k in range(K):
        e = jnp.exp(s4s[k] - m)                        # [T, H] f32
        den = den + e
        w_k = jnp.dot(e.astype(dt), hmat.T,
                      preferred_element_type=jnp.float32)  # bcast [T, W]
        contrib = w_k * vv[:, k, :].astype(jnp.float32)
        num = contrib if num is None else num + contrib
    rec = jnp.dot((1.0 / den).astype(dt), hmat.T,
                  preferred_element_type=jnp.float32)
    attn = (num * rec).astype(dt)                      # [T, W]
    o = mm(attn, a_wfc)

    y = (o + mv).astype(jnp.float32)                   # residual
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=1, keepdims=True)
    yn = (y - mean) * jax.lax.rsqrt(var + LN_EPS)
    out_ref[...] = yn * ln_s + ln_b


def reference_agg(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale,
                  params, freqs, dt):
    """Pure-JAX replica of the fused segment (flax-module math, reference
    conditional_nerf.py query()); used for the custom-VJP backward and the
    kernel parity tests."""
    N, K, _ = nb_feat.shape
    off = (xyz[:, None, :] - nb_xyz) / scale
    parts = [off.astype(dt)]
    sins, coss = [], []
    for f in freqs:
        sins.append(jnp.sin(off * f).astype(dt))
        coss.append(jnp.cos(off * f).astype(dt))
    emb = jnp.concatenate(parts + sins + coss, axis=-1)

    d3 = direction[:, None, :3]
    diff = d3 - nb_dir[..., :3]
    n = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-12)
    rd = diff / jnp.maximum(n, 1e-6)
    rdot = jnp.sum(d3 * nb_dir[..., :3], axis=-1, keepdims=True)
    rdiff = jnp.concatenate([rd, rdot], axis=-1).astype(dt)
    h = _leaky(rdiff @ params["rd_w1"].astype(dt) + params["rd_b1"].astype(dt))
    rdfc = _leaky(h @ params["rd_w2"].astype(dt) + params["rd_b2"].astype(dt))

    x_in = jnp.concatenate([nb_feat.astype(dt), emb, rdfc], axis=-1)
    h = _leaky(x_in @ params["b_w0p"].astype(dt) + params["b_b0"].astype(dt))
    h = _leaky(h @ params["b_w1"].astype(dt) + params["b_b1"].astype(dt))
    pf = _leaky(h @ params["b_w2"].astype(dt) + params["b_b2"].astype(dt))

    mv = mv_agg.astype(dt)
    q = mv @ params["a_wq"].astype(dt)
    kk = pf @ params["a_wk"].astype(dt)
    vv = pf @ params["a_wv"].astype(dt)
    outs = []
    inv = 1.0 / (D_K ** 0.5)
    for hd in range(N_HEAD):
        sl = slice(hd * D_K, (hd + 1) * D_K)
        s = jnp.sum((q[:, sl] * dt(inv))[:, None, :] * kk[..., sl], axis=-1)
        a = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.sum(a[..., None] * vv[..., sl], axis=1))
    o = jnp.concatenate(outs, axis=-1) @ params["a_wfc"].astype(dt)

    y = (o + mv).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    yn = (y - mean) * jax.lax.rsqrt(var + LN_EPS)
    return yn * params["ln_s"] + params["ln_b"]


def extract_agg_params(variables, F: int, feat_dim: int) -> dict:
    """Pull the fused segment's weights out of a ConditionalNeRF param tree
    (bound `self.variables['params']`), permuting base_mlp fc0 rows to the
    kernel's x_in layout."""
    rd = variables["ray_diff_fc"]
    bm = variables["base_mlp"]
    at = variables["base_mlp_attn"]
    rdfc_dim = rd["fc1"]["kernel"].shape[1]
    perm = jnp.asarray(_emb_perm(F, feat_dim, rdfc_dim), jnp.int32)
    return {
        "rd_w1": rd["fc0"]["kernel"], "rd_b1": rd["fc0"]["bias"],
        "rd_w2": rd["fc1"]["kernel"], "rd_b2": rd["fc1"]["bias"],
        "b_w0p": bm["fc0"]["kernel"][perm], "b_b0": bm["fc0"]["bias"],
        "b_w1": bm["fc1"]["kernel"], "b_b1": bm["fc1"]["bias"],
        "b_w2": bm["fc2"]["kernel"], "b_b2": bm["fc2"]["bias"],
        "a_wq": at["w_qs"]["kernel"], "a_wk": at["w_ks"]["kernel"],
        "a_wv": at["w_vs"]["kernel"], "a_wfc": at["fc"]["kernel"],
        "ln_s": at["layer_norm"]["scale"][None, :],
        "ln_b": at["layer_norm"]["bias"][None, :],
    }


def _slice_kernel_params(params, freqs, feat_dim: int, dt):
    """Pre-slice the fused weights into the kernel's concat-free blocks and
    build the two constant matrices (free outside the kernel; see _kernel
    docstring): bmat [3, 3F] block-diagonal band scales, hmat [4*D_K, 4]
    head-indicator."""
    F = len(freqs)
    w0 = params["b_w0p"]
    o = feat_dim
    bmat = jnp.kron(jnp.asarray(freqs, jnp.float32)[None, :], jnp.eye(3))
    hmat = jnp.repeat(jnp.eye(N_HEAD, dtype=jnp.float32), D_K, axis=0)
    return [bmat, hmat.astype(dt),
            params["rd_w1"], params["rd_b1"],
            params["rd_w2"], params["rd_b2"],
            w0[:o], w0[o:o + 3], w0[o + 3:o + 3 + 3 * F],
            w0[o + 3 + 3 * F:o + 3 + 6 * F], w0[o + 3 + 6 * F:],
            params["b_b0"], params["b_w1"], params["b_b1"],
            params["b_w2"], params["b_b2"],
            params["a_wq"], params["a_wk"], params["a_wv"], params["a_wfc"],
            params["ln_s"], params["ln_b"]]


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_neighbor_agg(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat,
                       scale, params, freqs, dt, tile: int = 256):
    """feature_agg [N, W] f32 for K-neighbor samples. See module docstring.

    xyz [N,3] f32, direction [N,>=3], mv_agg [N,W], nb_xyz [N,K,3] f32,
    nb_dir [N,K,4], nb_feat [N,K,F], scale scalar; params from
    extract_agg_params; freqs static tuple; dt static compute dtype.
    """
    return _fused_fwd_impl(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat,
                           scale, params, freqs, dt, tile)


def _fused_fwd_impl(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale,
                    params, freqs, dt, tile):
    N, K, Fdim = nb_feat.shape
    W = mv_agg.shape[-1]

    # offsets + ray-diff geometry stay in XLA (cheap elementwise; Mosaic
    # cannot rank-expand broadcasts), exactly the reference_agg math
    off = (xyz[:, None, :] - nb_xyz) / scale            # [N, K, 3] f32
    d3 = direction[:, None, :3]
    diff = d3 - nb_dir[..., :3]
    n = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-12)
    rd = diff / jnp.maximum(n, 1e-6)
    rdot = jnp.sum(d3 * nb_dir[..., :3], axis=-1, keepdims=True)
    rdiff = jnp.concatenate([rd, rdot], axis=-1)        # [N, K, 4] f32

    T = tile
    pad = (-N) % T
    if pad:
        def p0(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        mv_agg, off, rdiff, nb_feat = (p0(mv_agg), p0(off), p0(rdiff),
                                       p0(nb_feat))
    Np = N + pad
    grid = (Np // T,)

    def blk(shape):
        return pl.BlockSpec((T,) + shape, lambda i: (i,) + (0,) * len(shape))

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    pvals = _slice_kernel_params(params, freqs, Fdim, dt)
    out = pl.pallas_call(
        partial(_kernel, dt=dt),
        grid=grid,
        in_specs=[blk((W,)), blk((K, 3)), blk((K, 4)), blk((K, Fdim))]
        + [whole(p) for p in pvals],
        out_specs=pl.BlockSpec((T, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, W), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(mv_agg, off, rdiff, nb_feat, *pvals)
    return out[:N]


def _fused_fwd(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale,
               params, freqs, dt, tile):
    out = _fused_fwd_impl(xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat,
                          scale, params, freqs, dt, tile)
    return out, (xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale,
                 params)


def _fused_bwd(freqs, dt, tile, res, g):
    xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale, params = res
    _, vjp = jax.vjp(
        lambda *a: reference_agg(*a, freqs=freqs, dt=dt),
        xyz, direction, mv_agg, nb_xyz, nb_dir, nb_feat, scale, params)
    return vjp(g)


fused_neighbor_agg.defvjp(_fused_fwd, _fused_bwd)
