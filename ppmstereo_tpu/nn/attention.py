"""Attention library: sinusoidal PEs, LoFTR linear attention, time attention.

Re-designs of /root/reference/models/core/attention.py and the attention
pieces of ppmtereo_update.py (TimeAttnBlock :593-618, SpaceAttnBlock
:621-631, temporal PE :25-88). Works on (B, T, H, W, C) channels-last
videos; token reshapes are pure views. Attention matmuls carry
preferred f32 accumulation and run in the module dtype (bf16 under the
mixed-precision policy) on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.nn.initializers import xavier_uniform, zeros

from ppmstereo_tpu.nn.common import Dense


def position_encoding_sine(h: int, w: int, d_model: int) -> np.ndarray:
    """2-D sinusoidal PE, (H, W, C), LoFTR temp_bug_fix variant
    (reference attention.py:23-57). 1-based positions, channel interleave
    [sin x, cos x, sin y, cos y] every 4 channels."""
    pe = np.zeros((h, w, d_model), dtype=np.float32)
    y_pos = np.arange(1, h + 1, dtype=np.float32)[:, None, None]
    x_pos = np.arange(1, w + 1, dtype=np.float32)[None, :, None]
    div = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float32)
        * (-math.log(10000.0) / (d_model // 2))
    )[None, None, :]
    pe[:, :, 0::4] = np.sin(x_pos * div)
    pe[:, :, 1::4] = np.cos(x_pos * div)
    pe[:, :, 2::4] = np.sin(y_pos * div)
    pe[:, :, 3::4] = np.cos(y_pos * div)
    return pe


def temporal_positional_encoding(
    t: int, channels: int, normalize: bool = True, scale: float = 1.0
) -> np.ndarray:
    """Sinusoidal temporal PE, (T, C) (reference ppmtereo_update.py:25-88)."""
    pos = np.arange(t, dtype=np.float32)
    if normalize:
        pos = pos / max(t - 1, 1) * scale
    div = 1.0 / (10000.0 ** (np.arange(0, channels, 2, dtype=np.float32) / channels))
    ang = pos[:, None] * div[None, :]
    pe = np.zeros((t, channels), dtype=np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def linear_attention(q, k, v, eps: float = 1e-6):
    """'Transformers are RNNs' linear attention (attention.py:67-100).

    q: (N, L, H, D), k/v: (N, S, H, D). elu+1 feature map; O(N·D²)
    contractions — two MXU matmuls instead of an L×S attention matrix.
    """
    q = nn.elu(q) + 1
    k = nn.elu(k) + 1
    v_length = v.shape[1]
    v = v / v_length
    kv = jnp.einsum("nshd,nshv->nhdv", k, v, preferred_element_type=jnp.float32)
    z = 1.0 / (
        jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1), preferred_element_type=jnp.float32)
        + eps
    )
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv.astype(q.dtype), z.astype(q.dtype))
    return out * v_length


def full_attention(q, k, v):
    """Softmax attention over (N, L, H, D) tokens (attention.py:103-136)."""
    scale = 1.0 / q.shape[-1] ** 0.5
    logits = jnp.einsum("nlhd,nshd->nlsh", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scale * logits, axis=2).astype(v.dtype)
    return jnp.einsum("nlsh,nshd->nlhd", probs, v)


class LoFTREncoderLayer(nn.Module):
    """Pre-projection + linear attention + merge + MLP residual block
    (attention.py:140-190). xavier_uniform init per the reference's
    _reset_parameters (:208-211)."""

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, source):
        n = x.shape[0]
        dim = self.d_model // self.nhead

        def proj(name):
            return nn.Dense(
                self.d_model,
                use_bias=False,
                kernel_init=xavier_uniform(),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        q = proj("q_proj")(x).reshape(n, -1, self.nhead, dim)
        k = proj("k_proj")(source).reshape(n, -1, self.nhead, dim)
        v = proj("v_proj")(source).reshape(n, -1, self.nhead, dim)

        attn = linear_attention if self.attention == "linear" else full_attention
        message = attn(q, k, v).reshape(n, -1, self.d_model)
        message = proj("merge")(message)
        message = nn.LayerNorm(epsilon=1e-5, dtype=message.dtype, param_dtype=jnp.float32)(message)

        message = jnp.concatenate([x, message], axis=-1)
        message = nn.Dense(
            2 * self.d_model, use_bias=False, kernel_init=xavier_uniform(),
            dtype=self.dtype, param_dtype=jnp.float32,
        )(message)
        message = nn.relu(message)
        message = nn.Dense(
            self.d_model, use_bias=False, kernel_init=xavier_uniform(),
            dtype=self.dtype, param_dtype=jnp.float32,
        )(message)
        message = nn.LayerNorm(epsilon=1e-5, dtype=message.dtype, param_dtype=jnp.float32)(message)

        return x + message


class LocalFeatureTransformer(nn.Module):
    """Self/cross LoFTR stack over two token sets (attention.py:193-236)."""

    d_model: int
    nhead: int
    layer_names: tuple
    attention: str = "linear"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feat0, feat1):
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(
                self.d_model, self.nhead, self.attention, dtype=self.dtype,
                name=f"layer_{i}",
            )
            if name == "self":
                feat0 = layer(feat0, feat0)
                feat1 = layer(feat1, feat1)
            elif name == "cross":
                # sequential, NOT simultaneous: feat1 attends to the
                # already-updated feat0 (reference attention.py:231-232)
                feat0 = layer(feat0, feat1)
                feat1 = layer(feat1, feat0)
            else:
                raise KeyError(name)
        return feat0, feat1


def _degenerate_attention(x, num_heads: int):
    """The reference's TimeAttnBlock attention applies no q/k/v projection
    (ppmtereo_update.py:409-420): q = k = v = x split into heads."""
    b, n, c = x.shape
    dh = c // num_heads
    q = x.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhid,bhjd->bhij", q, q, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (dh**-0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", probs, q)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class TimeAttnBlock(nn.Module):
    """Per-pixel temporal attention with a zero-init output projection
    (ppmtereo_update.py:593-618). Input (B, T, H, W, C)."""

    dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=tokens.dtype, param_dtype=jnp.float32)(tokens)
        y = _degenerate_attention(y, self.num_heads)
        y = Dense(self.dim, dtype=self.dtype, name="proj")(y)
        y = nn.Dense(
            self.dim, kernel_init=zeros, bias_init=zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="temporal_fc",
        )(y)
        y = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x + y


class SpaceAttnBlock(nn.Module):
    """Per-frame spatial LoFTR self-attention (ppmtereo_update.py:621-631)."""

    dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        tokens = x.reshape(b * t, h * w, c)
        tokens = LoFTREncoderLayer(self.dim, self.num_heads, "linear", dtype=self.dtype)(
            tokens, tokens
        )
        return tokens.reshape(b, t, h, w, c)


class Mlp(nn.Module):
    """Transformer MLP (ppmtereo_update.py:567-590). Dead in the shipped
    reference config (only the commented-out 2-D update path used it);
    carried for API completeness."""

    hidden_features: int | None = None
    out_features: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hid = self.hidden_features or c
        out = self.out_features or c
        x = Dense(hid, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return Dense(out, dtype=self.dtype, name="fc2")(x)


class RelPosEmb(nn.Module):
    """Decomposed 2-D relative position bias (ppmtereo_update.py:372-397).
    Dead in the shipped reference config; carried for API completeness.

    q: (B, heads, H, W, d) -> scores (B, heads, H, W, H, W).
    """

    max_pos_size: int
    dim_head: int

    @nn.compact
    def __call__(self, q):
        n = 2 * self.max_pos_size - 1
        # torch nn.Embedding default init: N(0, 1)
        emb_init = jax.nn.initializers.normal(stddev=1.0)
        rel_height = self.param("rel_height", emb_init, (n, self.dim_head))
        rel_width = self.param("rel_width", emb_init, (n, self.dim_head))

        _, _, h, w, _ = q.shape
        deltas = jnp.arange(self.max_pos_size)[None, :] - jnp.arange(
            self.max_pos_size
        )[:, None]
        rel_ind = deltas + self.max_pos_size - 1

        height_emb = rel_height[rel_ind[:h, :h].reshape(-1)].reshape(
            h, h, 1, self.dim_head
        )
        width_emb = rel_width[rel_ind[:w, :w].reshape(-1)].reshape(
            w, 1, w, self.dim_head
        )
        height_score = jnp.einsum("bhxyd,xuvd->bhxyuv", q, height_emb)
        width_score = jnp.einsum("bhxyd,yuvd->bhxyuv", q, width_emb)
        return height_score + width_score
