"""DINOv2 ViT encoder (flax, channels-last tokens).

Re-design of /root/reference/models/video_depth_anything/dinov2.py
(standard DINOv2: patch-14 embed, learned pos embed with bicubic
interpolation to arbitrary grids, pre-norm blocks with LayerScale
init 1.0, GELU MLP). Only the pieces the VDA head consumes are exposed:
`get_intermediate_layers` returning (patch_tokens, cls_token) per
requested depth.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_CONFIGS = {
    # name: (embed_dim, depth, num_heads)
    "vits": (384, 12, 6),
    "vitb": (768, 12, 12),
    "vitl": (1024, 24, 16),
}

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _torch_bicubic_weights(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """Row-stochastic (n_out, n_in) matrix replicating torch
    F.interpolate(mode='bicubic', align_corners=False,
    scale_factor=scale, antialias=False): src = (dst+0.5)/scale - 0.5,
    cubic convolution kernel A=-0.75, border-clamped taps."""
    A = -0.75

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            ((A + 2) * x - (A + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * A, 0.0),
        )

    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, n_in - 1)
        np.add.at(w, (np.arange(n_out), idx), kernel(frac - tap))
    return w.astype(np.float32)


def interpolate_pos_embed(patch_pe, ph: int, pw: int, grid: int,
                          offset: float = 0.1):
    """DINOv2 pos-embed interpolation (reference dinov2.py:179-211):
    bicubic with the 0.1 scale-factor offset workaround, no antialias.
    patch_pe: (1, grid, grid, dim) -> (1, ph, pw, dim)."""
    wy = jnp.asarray(_torch_bicubic_weights(grid, ph, (ph + offset) / grid))
    wx = jnp.asarray(_torch_bicubic_weights(grid, pw, (pw + offset) / grid))
    out = jnp.einsum("oi,bijd->bojd", wy, patch_pe.astype(jnp.float32))
    out = jnp.einsum("oj,bijd->biod", wx, out)
    return out


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        dh = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=_trunc02, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, dh), 3, axis=2)
        q, k, v = (z.squeeze(2).transpose(0, 2, 1, 3) for z in (q, k, v))
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * dh**-0.5, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=_trunc02, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
        y = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)

        y = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
        hid = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hid, dtype=self.dtype, param_dtype=jnp.float32, kernel_init=_trunc02)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, kernel_init=_trunc02)(y)
        x = x + LayerScale(self.dim, name="ls2")(y)
        return x


class DINOv2(nn.Module):
    """Input (N, H, W, 3) with H, W multiples of 14."""

    model_name: str = "vits"
    patch_size: int = 14
    pos_grid: int = 37  # 518/14, the DINOv2 pretraining grid
    dtype: jnp.dtype | None = None

    @nn.compact
    def get_intermediate_layers(self, x, layer_idx: tuple):
        dim, depth, heads = _CONFIGS[self.model_name]
        n, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size

        tokens = nn.Conv(
            dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(x).reshape(n, ph * pw, dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        pos_embed = self.param(
            "pos_embed", _trunc02, (1, self.pos_grid * self.pos_grid + 1, dim)
        )

        # bicubic pos-embed interpolation to the (ph, pw) grid
        # (torch-exact semantics incl. the 0.1 offset; the reference skips
        # interpolation only at the square pretraining grid, dinov2.py:183)
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:].reshape(1, self.pos_grid, self.pos_grid, dim)
        if (ph, pw) != (self.pos_grid, self.pos_grid):
            patch_pe = interpolate_pos_embed(patch_pe, ph, pw, self.pos_grid)
        patch_pe = patch_pe.reshape(1, ph * pw, dim)

        tokens = tokens + patch_pe.astype(tokens.dtype)
        cls = jnp.broadcast_to(
            (cls_token + cls_pe).astype(tokens.dtype), (n, 1, dim)
        )
        x = jnp.concatenate([cls, tokens], axis=1)

        # the reference applies the FINAL LayerNorm to every requested
        # intermediate layer (get_intermediate_layers norm=True default,
        # dinov2.py:297-313)
        final_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32, name="norm"
        )
        outs = []
        want = set(layer_idx)
        for i in range(depth):
            x = Block(dim, heads, dtype=self.dtype, name=f"block_{i}")(x)
            if i in want:
                y = final_norm(x)
                outs.append((y[:, 1:], y[:, 0]))
        return outs

    def __call__(self, x, layer_idx: tuple = (2, 5, 8, 11)):
        return self.get_intermediate_layers(x, layer_idx)


def intermediate_layer_idx(model_name: str) -> tuple:
    return {"vits": (2, 5, 8, 11), "vitl": (4, 11, 17, 23)}[model_name]


def embed_dim(model_name: str) -> int:
    return _CONFIGS[model_name][0]
