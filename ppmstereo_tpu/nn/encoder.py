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
