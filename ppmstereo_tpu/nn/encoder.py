"""RAFT-style feature encoders, channels-last flax.

Re-designs of /root/reference/models/core/extractor.py:302-422
(ResidualBlock, BasicEncoder). 7x7-stride-2 stem + three residual stages
-> 1/4 resolution, `output_dim` channels. Instance norm by default (the
PPMStereo fnet config, ppmstereo.py:70-72). Left/right frames are folded
into the batch axis by the caller — one big conv batch for the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.norm import InstanceNorm


def _make_norm(norm_fn: str, num_groups: int = 8):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, (3, 3), stride=self.stride, kernel_init="kaiming_out", dtype=self.dtype)(x)
        y = _make_norm(self.norm_fn, self.planes // 8)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(y)
        y = _make_norm(self.norm_fn, self.planes // 8)(y)
        y = nn.relu(y)

        # The reference always applies a 1x1 downsample projection
        # (extractor.py:334-336, unconditional).
        x = Conv(self.planes, (1, 1), stride=self.stride, padding=(0, 0), kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn, self.planes // 8)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        x = nn.relu(x)

        for planes, stride in ((64, 1), (96, 2), (128, 1)):
            x = ResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype)(x)
            x = ResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype)(x)

        x = Conv(self.output_dim, (1, 1), padding=(0, 0), kernel_init="kaiming_out", dtype=self.dtype)(x)
        return x


class BasicEncoderVFM(nn.Module):
    """BasicEncoder with foundation features concatenated before the
    output conv (reference extractor.py:426-499): the 768-ch VFM map is
    expected at the encoder's 1/4 grid."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, vfm_features):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        x = nn.relu(x)
        for planes, stride in ((64, 1), (96, 2), (128, 1)):
            x = ResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype)(x)
            x = ResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype)(x)
        x = jnp.concatenate([x, vfm_features], axis=-1)
        return Conv(self.output_dim, (1, 1), padding=(0, 0), kernel_init="kaiming_out", dtype=self.dtype)(x)


class ResNetFPN(nn.Module):
    """ResNet-style FPN encoder (reference extractor.py:107-298 —
    available-but-unused variant kept for architecture-switch parity):
    4 stages + top-down 1x1 lateral fusion, output at 1/4."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        c2 = nn.relu(x)  # 1/2
        c2 = ResidualBlock(64, self.norm_fn, 1, dtype=self.dtype)(c2)
        c3 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(c2)  # 1/4
        c4 = ResidualBlock(256, self.norm_fn, 2, dtype=self.dtype)(c3)  # 1/8
        c5 = ResidualBlock(512, self.norm_fn, 2, dtype=self.dtype)(c4)  # 1/16

        def lateral(c, name):
            return Conv(self.output_dim, (1, 1), padding=(0, 0),
                        kernel_init="kaiming_out", dtype=self.dtype, name=name)(c)

        p5 = lateral(c5, "lat5")
        p4 = lateral(c4, "lat4") + jnp.repeat(jnp.repeat(p5, 2, -3), 2, -2)
        p3 = lateral(c3, "lat3") + jnp.repeat(jnp.repeat(p4, 2, -3), 2, -2)
        return Conv(self.output_dim, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(p3)


class _UpFuse(nn.Module):
    """Upsample(2x nearest) + 3x3 conv + instance norm + relu
    (reference extractor.py:528-541)."""

    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
        x = Conv(self.out_dim, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class _DecodeVFM(nn.Module):
    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.out_dim, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        return Conv(self.out_dim, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(x)


class MultiLevelEncoderVFM(nn.Module):
    """3-scale encoder fusing foundation-model (VFM) features at
    1/16, 1/8 and 1/4 with top-down upconvs
    (reference extractor.py:501-620 MultiLevelEncoder_VFM).

    vfm_features: 4 maps (finest->coarsest) already resized by the caller
    to 1/4, 1/8, 1/16 and 1/32 of the input, `vfm_dim` channels each.
    Returns (f4, f8, f16), each `output_dim` channels.
    """

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, vfm_features):
        d = self.output_dim
        # downsample=2 config: stride-1 stem, strides at layers 2 and 3
        # (reference extractor.py:518-524)
        x = Conv(64, (7, 7), stride=1, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        x = nn.relu(x)

        x = ResidualBlock(64, self.norm_fn, 1, dtype=self.dtype)(x)
        x = ResidualBlock(64, self.norm_fn, 1, dtype=self.dtype)(x)
        x = ResidualBlock(96, self.norm_fn, 2, dtype=self.dtype)(x)
        x = ResidualBlock(96, self.norm_fn, 1, dtype=self.dtype)(x)
        x4 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(x)
        x4 = ResidualBlock(128, self.norm_fn, 1, dtype=self.dtype)(x4)
        x8 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(x4)
        x8 = ResidualBlock(128, self.norm_fn, 1, dtype=self.dtype)(x8)
        x16 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(x8)
        x16 = ResidualBlock(128, self.norm_fn, 1, dtype=self.dtype)(x16)

        v4, v8, v16, v32 = vfm_features
        up16 = _UpFuse(64, dtype=self.dtype, name="upconv_16")(v32)
        f16 = _DecodeVFM(d, dtype=self.dtype, name="decode_16x")(
            jnp.concatenate([x16, v16, up16], axis=-1)
        )
        up8 = _UpFuse(128, dtype=self.dtype, name="upconv_8")(f16)
        f8 = _DecodeVFM(d, dtype=self.dtype, name="decode_8x")(
            jnp.concatenate([x8, v8, up8], axis=-1)
        )
        up4 = _UpFuse(128, dtype=self.dtype, name="upconv_4")(f8)
        f4 = _DecodeVFM(d, dtype=self.dtype, name="decode_4x")(
            jnp.concatenate([x4, v4, up4], axis=-1)
        )
        return f4, f8, f16


class MultiLevelResNetFPN(nn.Module):
    """3-scale ResNet-FPN variant (reference extractor.py:107-298,
    available-but-unused): returns (1/4, 1/8, 1/16) maps."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        c2 = nn.relu(x)
        c2 = ResidualBlock(64, self.norm_fn, 1, dtype=self.dtype)(c2)
        c3 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(c2)   # 1/4
        c4 = ResidualBlock(256, self.norm_fn, 2, dtype=self.dtype)(c3)   # 1/8
        c5 = ResidualBlock(512, self.norm_fn, 2, dtype=self.dtype)(c4)   # 1/16

        def lateral(c, name):
            return Conv(self.output_dim, (1, 1), padding=(0, 0),
                        kernel_init="kaiming_out", dtype=self.dtype, name=name)(c)

        p5 = lateral(c5, "lat5")
        p4 = lateral(c4, "lat4") + jnp.repeat(jnp.repeat(p5, 2, -3), 2, -2)
        p3 = lateral(c3, "lat3") + jnp.repeat(jnp.repeat(p4, 2, -3), 2, -2)
        out = lambda p, n: Conv(self.output_dim, (3, 3), kernel_init="kaiming_out",
                                dtype=self.dtype, name=n)(p)
        return out(p3, "out4"), out(p4, "out8"), out(p5, "out16")
