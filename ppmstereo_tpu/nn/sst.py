"""SST ("space-super-time") attention block at 1/16 resolution.

Shared by PPMStereo (reference ppmstereo.py:322-395) and DynamicStereo
(reference dynamic_stereo.py:217-289): sinusoidal 2-D PE + learned time
embedding (nearest-interpolated when clip length differs from training
length) + `depth` rounds of [LoFTR self-attn, stereo cross-attn, temporal
attn] over both views.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppmstereo_tpu.nn.attention import (
    LocalFeatureTransformer,
    TimeAttnBlock,
    position_encoding_sine,
)


def _interp_nearest_time(embed, t: int):
    """torch F.interpolate(mode='nearest') along the frame axis
    (reference ppmstereo.py:349-353)."""
    t0 = embed.shape[1]
    if t0 == t:
        return embed
    # keep the index numpy: `embed` may be a numpy param tree leaf, and
    # numpy fancy-indexed with a traced jnp array raises under jit
    idx = np.floor(np.arange(t) * t0 / t).astype(np.int32)
    return jnp.asarray(embed)[:, idx]


class SSTBlock(nn.Module):
    dim: int = 256
    depth: int = 4
    num_frames: int = 5
    attention_type: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        at = self.attention_type or ""
        if "update_time" in at or "temporal" in at:
            self.time_embed = self.param(
                "time_embed", nn.initializers.zeros, (1, self.num_frames, self.dim)
            )
        if "temporal" in at:
            self.time_attn_blocks = [
                TimeAttnBlock(dim=self.dim, num_heads=8, dtype=self.dtype)
                for _ in range(self.depth)
            ]
        if "self_stereo" in at:
            self.self_attn_blocks = [
                LocalFeatureTransformer(self.dim, 8, ("self",), "linear", dtype=self.dtype)
                for _ in range(self.depth)
            ]
            self.cross_attn_blocks = [
                LocalFeatureTransformer(self.dim, 8, ("cross",), "linear", dtype=self.dtype)
                for _ in range(self.depth)
            ]

    def __call__(self, f1, f2):
        """f1/f2: (B, T, H, W, C) left/right 1/16 features."""
        b, t, h, w, d = f1.shape
        at = self.attention_type or ""

        pe = jnp.asarray(position_encoding_sine(h, w, d), dtype=f1.dtype)
        f1 = f1 + pe
        f2 = f2 + pe

        if "temporal" in at or "update_time" in at:
            te = _interp_nearest_time(self.time_embed, t).astype(f1.dtype)
            f1 = f1 + te[:, :, None, None, :]
            f2 = f2 + te[:, :, None, None, :]

        if "self_stereo" in at or "temporal" in at:
            for i in range(self.depth):
                if "self_stereo" in at:
                    t1 = f1.reshape(b * t, h * w, d)
                    t2 = f2.reshape(b * t, h * w, d)
                    t1, t2 = self.self_attn_blocks[i](t1, t2)
                    t1, t2 = self.cross_attn_blocks[i](t1, t2)
                    f1 = t1.reshape(b, t, h, w, d)
                    f2 = t2.reshape(b, t, h, w, d)
                if "temporal" in at:
                    f1 = self.time_attn_blocks[i](f1)
                    f2 = self.time_attn_blocks[i](f2)
        return f1, f2
