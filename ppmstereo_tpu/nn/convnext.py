"""ConvNeXt-V2 backbone + the PPMStereo context network ("cnet").

Re-design of /root/reference/models/core/convnext.py. Channels-last makes
the reference's permute dance disappear: LayerNorm / GRN / pointwise convs
all act on the trailing channel axis natively.

The reference loads frozen ImageNet-22k weights from a hard-coded personal
path (convnext.py:221-223) and runs the backbone under no_grad (:257). Here
the backbone is a plain flax module; freezing is expressed functionally via
stop_gradient (and by the optimizer param partition in train/), and
pretrained torch checkpoints can be imported with
ppmstereo_tpu.utils.torch_import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import zeros

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.norm import InstanceNorm

_DEPTHS = {
    "atto": (2, 2, 6, 2),
    "femto": (2, 2, 6, 2),
    "pico": (2, 2, 6, 2),
    "nano": (2, 2, 8, 2),
    "tiny": (3, 3, 9, 3),
    "base": (3, 3, 27, 3),
    "large": (3, 3, 27, 3),
    "huge": (3, 3, 27, 3),
}
_DIMS = {
    "atto": (40, 80, 160, 320),
    "femto": (48, 96, 192, 384),
    "pico": (64, 128, 256, 512),
    "nano": (80, 160, 320, 640),
    "tiny": (96, 192, 384, 768),
    "base": (128, 256, 512, 1024),
    "large": (192, 384, 768, 1536),
    "huge": (352, 704, 1408, 2816),
}

# truncated-normal(std=0.02) matching the reference's trunc_normal_ init
_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class GRN(nn.Module):
    """Global Response Normalization (convnext.py:37-48), channels-last."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", zeros, (dim,))
        beta = self.param("beta", zeros, (dim,))
        x32 = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(x32**2, axis=(-3, -2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x32 * nx) + beta + x32).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        inp = x
        x = Conv(
            self.dim, (7, 7), feature_group_count=self.dim, dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
        x = nn.Dense(4 * self.dim, kernel_init=_trunc02, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = GRN()(x)
        x = nn.Dense(self.dim, kernel_init=_trunc02, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return inp + x


class ConvNeXtV2(nn.Module):
    """Four-stage backbone returning (x4, x8, x16, x32) pyramid features."""

    model_name: str = "tiny"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        depths, dims = _DEPTHS[self.model_name], _DIMS[self.model_name]
        feats = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    kernel_init=_trunc02, dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, param_dtype=jnp.float32)(x)
                x = nn.Conv(
                    dims[i], (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=_trunc02, dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
            for _ in range(depths[i]):
                x = ConvNeXtBlock(dims[i], dtype=self.dtype)(x)
            feats.append(x)
        return tuple(feats)


class _UpConv(nn.Module):
    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)  # nearest 2x
        x = Conv(self.out_dim, (3, 3), dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class _Decode(nn.Module):
    out_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.out_dim, (1, 1), padding=(0, 0), dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        return Conv(self.out_dim, (3, 3), dtype=self.dtype)(x)


class ContextNet(nn.Module):
    """Frozen ConvNeXt-V2 + trainable top-down decoders -> (x4, x8, x16),
    each `output_dim` channels (reference convnext.py:202-264 Feature)."""

    model_name: str = "tiny"
    output_dim: int = 256
    freeze_backbone: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x4, x8, x16, x32 = ConvNeXtV2(self.model_name, dtype=self.dtype, name="convnext")(x)
        if self.freeze_backbone:
            x4, x8, x16, x32 = (jax.lax.stop_gradient(v) for v in (x4, x8, x16, x32))

        d = self.output_dim
        up16 = _UpConv(d, dtype=self.dtype, name="upconv_16")(x32)
        x16 = _Decode(d, dtype=self.dtype, name="decode_16x")(
            jnp.concatenate([x16, up16], axis=-1)
        )
        up8 = _UpConv(d, dtype=self.dtype, name="upconv_8")(x16)
        x8 = _Decode(d, dtype=self.dtype, name="decode_8x")(
            jnp.concatenate([x8, up8], axis=-1)
        )
        up4 = _UpConv(d, dtype=self.dtype, name="upconv_4")(x8)
        x4 = _Decode(d, dtype=self.dtype, name="decode_4x")(
            jnp.concatenate([x4, up4], axis=-1)
        )
        return x4, x8, x16
