"""DPT decoder head with temporal motion modules (flax, channels-last).

Re-design of /root/reference/models/video_depth_anything/dpt.py +
dpt_temporal.py + util/blocks.py: per-layer 1x1 projections, resize
stack (x4 deconv, x2 deconv, identity, /2 conv), scratch 3x3 RN convs,
refinenet feature-fusion (2x ResidualConvUnit + bilinear x2 + 1x1 out),
with AnimateDiff TemporalModules inserted at layers 3/4 and after
refinenet4/3 (dpt_temporal.py:53-94). Output: (B*T, ph*14, pw*14,
features//2) depth feature map (output_conv1 only; the scalar depth head
output_conv2 is carried for checkpoint completeness but unused by the
stereo models, matching dpt_temporal.py:96).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.vda.motion import TemporalModule
from ppmstereo_tpu.ops.geometry import interp_bilinear


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype, name="res1")(res)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="res2")(x)
        if size is None:
            size = (2 * x.shape[-3], 2 * x.shape[-2])
        x = interp_bilinear(x, size)  # align_corners=True
        return Conv(self.features, (1, 1), padding=(0, 0), dtype=self.dtype, name="out_conv")(x)


class DPTHeadTemporal(nn.Module):
    """out_features: 4 tuples of (patch_tokens (N, ph*pw, D), cls).

    N = B*T frames; temporal attention reshapes internally via T.
    """

    in_channels: int
    features: int = 64
    out_channels: tuple = (48, 96, 192, 384)
    num_frames: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, out_features, patch_h, patch_w, t, return_paths: bool = False):
        oc = self.out_channels
        f = self.features

        def project(i, tokens):
            n = tokens.shape[0]
            x = tokens.reshape(n, patch_h, patch_w, -1)
            x = Conv(oc[i], (1, 1), padding=(0, 0), dtype=self.dtype, name=f"project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    oc[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    oc[1], (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="resize_1",
                )(x)
            elif i == 3:
                x = Conv(oc[3], (3, 3), stride=2, dtype=self.dtype, name="resize_3")(x)
            return x

        layers = [project(i, tok) for i, (tok, _cls) in enumerate(out_features)]
        l1, l2, l3, l4 = layers

        def to_video(x):
            n, h, w, c = x.shape
            return x.reshape(n // t, t, h, w, c)

        def to_frames(x):
            b, tt, h, w, c = x.shape
            return x.reshape(b * tt, h, w, c)

        mm_kwargs = dict(
            num_heads=8, num_transformer_block=1, num_attention_blocks=2,
            temporal_max_len=self.num_frames, dtype=self.dtype,
        )
        l3 = to_frames(TemporalModule(oc[2], **mm_kwargs, name="motion_0")(to_video(l3)))
        l4 = to_frames(TemporalModule(oc[3], **mm_kwargs, name="motion_1")(to_video(l4)))

        rn = [
            Conv(f, (3, 3), use_bias=False, dtype=self.dtype, name=f"layer{i+1}_rn")(x)
            for i, x in enumerate((l1, l2, l3, l4))
        ]

        path4 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[-3:-1]
        )
        path4 = to_frames(TemporalModule(f, **mm_kwargs, name="motion_2")(to_video(path4)))
        path3 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[-3:-1]
        )
        path3 = to_frames(TemporalModule(f, **mm_kwargs, name="motion_3")(to_video(path3)))
        path2 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[-3:-1]
        )
        path1 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet1")(path2, rn[0])

        out = Conv(f // 2, (3, 3), dtype=self.dtype, name="output_conv1")(path1)
        out = interp_bilinear(out, (patch_h * 14, patch_w * 14))
        if return_paths:
            # finest -> coarsest `features`-ch fusion maps, the 64-ch VFM
            # pyramid MultiLevelEncoder_VFM consumes (extractor.py:601-611)
            return out, (path1, path2, path3, path4)
        return out
