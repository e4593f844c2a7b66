"""Motion encoders and context q/k projector.

Re-designs of /root/reference/models/core/ppmtereo_update.py:91-133
(PCBlock4_Deep_nopool_res, Attention_qk) and :423-482 (BasicMotionEncoder,
BasicMotionEncoder_v2). All operate on (B, T, H, W, C); 2-D convs treat
(B, T) as batch.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv


class PCBlock(nn.Module):
    """SKFlow-style depthwise-conv + FFN residual block
    (ppmtereo_update.py:91-115). k_conv lists depthwise kernel sizes."""

    c_in: int
    c_out: int
    k_conv: tuple = (1, 7)
    factor: float = 1.5
    dtype: jnp.dtype | None = None

    def setup(self):
        hid = int(self.factor * self.c_in)
        self.ffn1_a = Conv(hid, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.ffn1_b = Conv(self.c_in, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.dws = [
            Conv(self.c_in, (k, k), feature_group_count=self.c_in, dtype=self.dtype)
            for k in self.k_conv
        ]
        self.pw = Conv(self.c_in, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.ffn2_a = Conv(hid, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.ffn2_b = Conv(self.c_out, (1, 1), padding=(0, 0), dtype=self.dtype)

    def __call__(self, x):
        gelu = lambda y: nn.gelu(y, approximate=False)
        x = gelu(x + self.ffn1_b(gelu(self.ffn1_a(x))))
        for dw in self.dws:
            x = gelu(x + dw(x))
        x = gelu(x + self.pw(x))
        return self.ffn2_b(gelu(self.ffn2_a(x)))


class AttentionQK(nn.Module):
    """1x1 conv producing (query, key) from context features
    (ppmtereo_update.py:118-133)."""

    dim_head: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, fmap):
        qk = Conv(
            self.dim_head * 2, (1, 1), padding=(0, 0), use_bias=False,
            dtype=self.dtype, name="to_qk",
        )(fmap)
        return qk[..., : self.dim_head], qk[..., self.dim_head :]


class BasicMotionEncoder(nn.Module):
    """corr+flow -> 128-ch motion features (ppmtereo_update.py:423-442).

    corr_act: the PPM variant applies GELU after convc1
    (ppmtereo_update.py:435); DynamicStereo's otherwise-identical encoder
    applies ReLU (update.py:227)."""

    dtype: jnp.dtype | None = None
    corr_act: str = "gelu"

    @nn.compact
    def __call__(self, flow, corr):
        act = (
            (lambda y: nn.gelu(y, approximate=False))
            if self.corr_act == "gelu"
            else nn.relu
        )
        cor = act(Conv(256, (1, 1), padding=(0, 0), dtype=self.dtype)(corr))
        cor = nn.relu(Conv(192, (3, 3), dtype=self.dtype)(cor))
        flo = nn.relu(Conv(128, (7, 7), dtype=self.dtype)(flow))
        flo = nn.relu(Conv(64, (3, 3), dtype=self.dtype)(flo))
        out = nn.relu(Conv(126, (3, 3), dtype=self.dtype)(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicMotionEncoderV2(nn.Module):
    """Motion encoder with a recurrent 64-ch motion hidden state
    (ppmtereo_update.py:445-482). `init_hidden` bootstraps the state from
    context features (:462-471); the caller invokes it once before the
    scanned refinement loop (no None-branch under jit)."""

    cor_planes: int = 36
    dtype: jnp.dtype | None = None

    def setup(self):
        self.convc1 = PCBlock(self.cor_planes, 256, k_conv=(1, 7), dtype=self.dtype)
        self.convc2 = Conv(192, (3, 3), dtype=self.dtype)
        self.convf1 = Conv(128, (7, 7), dtype=self.dtype)
        self.convf2 = Conv(64, (3, 3), dtype=self.dtype)
        self.final_conv = Conv(126 + 64, (3, 3), dtype=self.dtype)
        self.init_conv1 = Conv(64, (3, 3), dtype=self.dtype)
        self.init_conv2 = Conv(64, (3, 3), dtype=self.dtype)

    def init_hidden(self, inp):
        return self.init_conv2(nn.relu(self.init_conv1(inp)))

    def __call__(self, flow, corr, motion_hidden_state):
        cor = nn.gelu(self.convc1(corr), approximate=False)
        cor = nn.relu(self.convc2(cor))
        flo = nn.relu(self.convf1(flow))
        flo = nn.relu(self.convf2(flo))

        cat = jnp.concatenate([cor, flo, motion_hidden_state], axis=-1)
        out = nn.relu(self.final_conv(cat))
        motion, hidden = out[..., :126], out[..., 126:]
        return jnp.concatenate([motion, flow], axis=-1), hidden


class SKMotionEncoder(nn.Module):
    """SKFlow-style PCBlock motion encoder
    (ppmtereo_update.py:485-509, SKMotionEncoder6_Deep_nopool_res_Mem_skflow).
    Dead in the shipped reference config (referenced only from the
    commented-out 2-D update path, :1044); carried for API completeness."""

    cor_planes: int
    k_conv: tuple = (1, 15)
    dtype: jnp.dtype | None = None

    def setup(self):
        self.convc1 = PCBlock(self.cor_planes, 256, self.k_conv, dtype=self.dtype)
        self.convc2 = PCBlock(256, 192, self.k_conv, dtype=self.dtype)
        self.convf1 = Conv(128, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.convf2 = PCBlock(128, 64, self.k_conv, dtype=self.dtype)
        self.conv = PCBlock(64 + 192, 126, self.k_conv, dtype=self.dtype)

    def __call__(self, flow, corr):
        cor = nn.gelu(self.convc1(corr), approximate=False)
        cor = self.convc2(cor)
        flo = self.convf1(flow)
        flo = self.convf2(flo)
        out = self.conv(jnp.concatenate([cor, flo], axis=-1))
        return jnp.concatenate([out, flow], axis=-1)
