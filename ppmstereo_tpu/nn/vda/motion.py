"""AnimateDiff-style temporal motion module (flax).

Re-design of /root/reference/models/video_depth_anything/motion_module/:
GroupNorm -> proj_in -> TemporalTransformerBlock(s) [per-pixel temporal
self-attention with sinusoidal APE + GEGLU feed-forward] -> zero-init
proj_out -> residual. Operates on (B, T, H, W, C) videos.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.nn.initializers import zeros


def _sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class TemporalAttention(nn.Module):
    """Per-pixel self-attention over the frame axis (motion_module.py:200-300).
    tokens: (N_pixels, T, C)."""

    dim: int
    num_heads: int = 8
    temporal_max_len: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tokens):
        n, t, c = tokens.shape
        pe = jnp.asarray(_sinusoidal_pe(self.temporal_max_len, c)[:t], tokens.dtype)
        tokens = tokens + pe

        dh = c // self.num_heads

        def proj(name, use_bias=False):
            return nn.Dense(c, use_bias=use_bias, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)

        q = proj("to_q")(tokens).reshape(n, t, self.num_heads, dh).transpose(0, 2, 1, 3)
        k = proj("to_k")(tokens).reshape(n, t, self.num_heads, dh).transpose(0, 2, 1, 3)
        v = proj("to_v")(tokens).reshape(n, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("nhid,nhjd->nhij", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * dh**-0.5, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhij,nhjd->nhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, t, c)
        return proj("to_out", use_bias=True)(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32)(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(h)


class TemporalTransformerBlock(nn.Module):
    dim: int
    num_heads: int = 8
    num_attention_blocks: int = 2
    temporal_max_len: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tokens):
        for i in range(self.num_attention_blocks):
            y = nn.LayerNorm(epsilon=1e-5, dtype=tokens.dtype, param_dtype=jnp.float32)(tokens)
            tokens = tokens + TemporalAttention(
                self.dim, self.num_heads, self.temporal_max_len,
                dtype=self.dtype, name=f"attn_{i}",
            )(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=tokens.dtype, param_dtype=jnp.float32)(tokens)
        return tokens + GEGLUFeedForward(self.dim, dtype=self.dtype)(y)


class TemporalModule(nn.Module):
    """x: (B, T, H, W, C) -> same, with temporal attention mixed in."""

    in_channels: int
    num_heads: int = 8
    num_transformer_block: int = 1
    num_attention_blocks: int = 2
    temporal_max_len: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(y)

        tokens = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        for i in range(self.num_transformer_block):
            tokens = TemporalTransformerBlock(
                c, self.num_heads, self.num_attention_blocks,
                self.temporal_max_len, dtype=self.dtype, name=f"block_{i}",
            )(tokens)
        y = tokens.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)

        y = nn.Dense(
            c, kernel_init=zeros, bias_init=zeros, dtype=self.dtype,
            param_dtype=jnp.float32, name="proj_out",
        )(y)
        return residual + y
