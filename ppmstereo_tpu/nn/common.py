"""Shared flax helpers: torch-parity convolutions and initializers.

Everything is channels-last ((..., H, W, C) for 2-D, (..., T, H, W, C) for
3-D); XLA lowers these directly onto the MXU without layout transposes.

Initializers reproduce the torch defaults the reference trains with, so
from-scratch training dynamics match:
  * torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(-sqrt(1/fan_in), sqrt(1/fan_in)), bias U(-1/sqrt(fan_in), ...).
  * the reference's BasicEncoder overrides with kaiming_normal(fan_out)
    (extractor.py:380-387).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import variance_scaling

# Conv lowers as explicit jnp.pad + VALID convolution (numerically
# identical to implicitly-padded conv for the symmetric paddings used
# here; XLA folds the pad back into the convolution). Reason: the Shardy
# partitioner (JAX 0.9 default) miscompiles lax.scan bodies containing
# IMPLICITLY-padded convolutions when the operand is sharded on two mesh
# axes at once (O(1)-wrong values) — with the padding made explicit the
# same graph partitions exactly (artifacts/shardy_probe_r4.py: `base`
# MISCOMPILE vs `padvalid` ok). PPM_CONV_IMPLICIT_PAD=1 restores the
# implicit lowering for A/B.
_IMPLICIT_PAD = os.environ.get("PPM_CONV_IMPLICIT_PAD", "0") == "1"

# torch nn.Conv2d / nn.Linear default weight init.
torch_conv_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# kaiming_normal(mode=fan_out, nonlinearity=relu) for encoder stacks.
kaiming_out_init = variance_scaling(2.0, "fan_out", "normal")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    import jax

    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """Convolution with torch-style explicit symmetric padding.

    kernel: ints, e.g. (3, 3) or (1, 1, 15) for 3-D; padding defaults to
    k//2 per spatial dim (torch's padding=same-for-odd-kernels idiom).
    """

    features: int
    kernel: Sequence[int]
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | None = None
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: str = "torch"  # "torch" | "kaiming_out"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel)
        pad = self.padding if self.padding is not None else tuple(ki // 2 for ki in k)
        stride = (
            (self.stride,) * len(k) if isinstance(self.stride, int) else tuple(self.stride)
        )
        init = torch_conv_kernel_init if self.kernel_init == "torch" else kaiming_out_init

        fan_in = 1
        for ki in k:
            fan_in *= ki
        fan_in *= x.shape[-1] // self.feature_group_count

        def bias_init(key, shape, dtype=jnp.float32):
            return torch_bias_init(key, shape, dtype, fan_in=fan_in)

        conv_padding = [(p, p) for p in pad]
        if not _IMPLICIT_PAD and any(p > 0 for p in pad):
            widths = [(0, 0)] * x.ndim
            for i, p in enumerate(pad):
                widths[x.ndim - 1 - len(k) + i] = (p, p)
            x = jnp.pad(x, widths)
            conv_padding = "VALID"
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=stride,
            padding=conv_padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    """torch-default-initialized Linear."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]

        def bias_init(key, shape, dtype=jnp.float32):
            return torch_bias_init(key, shape, dtype, fan_in=fan_in)

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
