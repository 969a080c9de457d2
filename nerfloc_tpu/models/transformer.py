"""Self/cross attention blocks for the 3D-2D matcher.

Rebuild of the reference SelfCrossTransformer (reference:
nerf_loc/models/COTR/transformer.py:17-63): despite its constructor args it
contains exactly ONE self-attention encoder layer per branch and ONE
cross-attention decoder layer per branch, post-norm, ReLU feed-forward,
positional embeddings added to Q and K only (transformer.py:189-250).

TPU notes: attention runs as plain batched matmuls (XLA maps them to the MXU
and fuses softmax); sequence lengths here are ~1k-2k tokens at d=192 so flash
attention-style tiling is unnecessary — the score matrix fits easily in VMEM
at these sizes. Masks support the padded fixed-shape token buffers.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _attn_mask(q_mask: Optional[Array], k_mask: Optional[Array], Lq: int, Lk: int):
    """Build a [B, 1, Lq, Lk] boolean mask from per-token validity masks."""
    if q_mask is None and k_mask is None:
        return None
    if q_mask is None:
        m = k_mask[:, None, None, :]
        return jnp.broadcast_to(m, (k_mask.shape[0], 1, Lq, Lk))
    if k_mask is None:
        m = q_mask[:, None, :, None]
        return jnp.broadcast_to(m, (q_mask.shape[0], 1, Lq, Lk))
    return (q_mask[:, None, :, None] & k_mask[:, None, None, :])


class EncoderLayer(nn.Module):
    """Post-norm self-attention + FF (TransformerEncoderLayer, :171-208)."""
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src: Array, pos: Array, mask: Optional[Array] = None) -> Array:
        q = k = src + pos
        attn_mask = _attn_mask(mask, mask, src.shape[1], src.shape[1])
        src2 = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, out_features=self.d_model,
            dtype=self.dtype, name="self_attn")(q, k, src, mask=attn_mask)
        src = nn.LayerNorm(name="norm1")(src + src2)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(name="norm2")(src + ff)


class DecoderLayer(nn.Module):
    """Post-norm cross-attention + FF (TransformerDecoderLayer, :211-250;
    note the reference layer has no self-attention inside)."""
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, query_pos: Array, pos: Array,
                 tgt_mask: Optional[Array] = None, mem_mask: Optional[Array] = None) -> Array:
        attn_mask = _attn_mask(tgt_mask, mem_mask, tgt.shape[1], memory.shape[1])
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, out_features=self.d_model,
            dtype=self.dtype, name="cross_attn")(tgt + query_pos, memory + pos, memory,
                                                 mask=attn_mask)
        tgt = nn.LayerNorm(name="norm2")(tgt + tgt2)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(name="norm3")(tgt + ff)


class SelfCrossTransformer(nn.Module):
    """Two token sets attend to themselves then to each other
    (SelfCrossTransformer.forward, transformer.py:43-63)."""
    d_model: int = 192
    nhead: int = 8
    dim_feedforward: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v0: Array, pos0: Array, v1: Array, pos1: Array,
                 mask0: Optional[Array] = None, mask1: Optional[Array] = None):
        """All inputs [B, N, C]; masks [B, N] bool (True = valid)."""
        v0 = EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                          dtype=self.dtype, name="self0")(v0, pos0, mask0)
        v1 = EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                          dtype=self.dtype, name="self1")(v1, pos1, mask1)
        v0b = DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                           dtype=self.dtype, name="cross0")(v0, v1, pos0, pos1, mask0, mask1)
        v1b = DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                           dtype=self.dtype, name="cross1")(v1, v0b, pos1, pos0, mask1, mask0)
        return v0b, v1b


class MultiHeadAttention(nn.Module):
    """IBRNet-style MHA with residual + layer-norm (reference ibrnet.py:69-119),
    used as the neighbour-aggregation attention in ConditionalNeRF.query
    (model.py:72,413-414). No bias on projections, scaled dot product."""
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, mask: Optional[Array] = None):
        residual = q
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        qh = nn.Dense(self.n_head * self.d_k, use_bias=False, dtype=self.dtype, name="w_qs")(q)
        kh = nn.Dense(self.n_head * self.d_k, use_bias=False, dtype=self.dtype, name="w_ks")(k)
        vh = nn.Dense(self.n_head * self.d_v, use_bias=False, dtype=self.dtype, name="w_vs")(v)
        qh = qh.reshape(B, Lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(B, Lk, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(B, Lk, self.n_head, self.d_v).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh)
        if mask is not None:
            attn = jnp.where(mask[:, None, :, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="fc")(out)
        out = nn.LayerNorm(name="layer_norm")(out + residual)
        return out, attn
