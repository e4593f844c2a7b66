"""Separable conv GRUs (2-D and 3-D), channels-last flax.

Re-designs of /root/reference/models/core/ppmtereo_update.py:147-369.
The default PPMStereo recurrence is SKSepConvGRU3D: three sequential
gated passes over width (large-kernel 1x1x15 -> 1x1x5), height (1x5x1)
and time (5x1x1) of a (B, T, H, W, C) volume. Each pass is three convs
whose inputs share the concat [h, x] — XLA fuses the gate arithmetic into
the conv epilogues; no manual kernel needed for parity-level perf.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv


def _gate(h, x, convz, convr, convq):
    hx = jnp.concatenate([h, x], axis=-1)
    z = nn.sigmoid(convz(hx))
    r = nn.sigmoid(convr(hx))
    q = jnp.tanh(convq(jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * q


class _SKConv(nn.Module):
    """Large-kernel -> GELU -> small-kernel stack used for the z/r gates."""

    features: int
    big: tuple
    small: tuple
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.big, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return Conv(self.features, self.small, dtype=self.dtype)(x)


class SepConvGRU(nn.Module):
    """2-D separable GRU: horizontal (1,5) then vertical (5,1) pass."""

    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        for k in ((1, 5), (5, 1)):
            h = _gate(
                h,
                x,
                Conv(d, k, dtype=self.dtype),
                Conv(d, k, dtype=self.dtype),
                Conv(d, k, dtype=self.dtype),
            )
        return h


class ConvGRU(nn.Module):
    hidden_dim: int = 128
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x):
        k = (self.kernel_size, self.kernel_size)
        return _gate(
            h,
            x,
            Conv(self.hidden_dim, k, dtype=self.dtype),
            Conv(self.hidden_dim, k, dtype=self.dtype),
            Conv(self.hidden_dim, k, dtype=self.dtype),
        )


class SKSepConvGRU(nn.Module):
    """2-D GRU with large-kernel z/r gates on the horizontal pass
    (reference ppmtereo_update.py:212-250)."""

    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        h = _gate(
            h,
            x,
            _SKConv(d, (1, 15), (1, 5), dtype=self.dtype),
            _SKConv(d, (1, 15), (1, 5), dtype=self.dtype),
            Conv(d, (1, 5), dtype=self.dtype),
        )
        h = _gate(
            h,
            x,
            Conv(d, (5, 1), dtype=self.dtype),
            Conv(d, (5, 1), dtype=self.dtype),
            Conv(d, (5, 1), dtype=self.dtype),
        )
        return h


class SKSepConvGRU3D(nn.Module):
    """Default PPM recurrence over (B, T, H, W, C)
    (reference ppmtereo_update.py:254-312): width pass with large kernels,
    then height, then time."""

    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        # width
        h = _gate(
            h,
            x,
            _SKConv(d, (1, 1, 15), (1, 1, 5), dtype=self.dtype),
            _SKConv(d, (1, 1, 15), (1, 1, 5), dtype=self.dtype),
            Conv(d, (1, 1, 5), dtype=self.dtype),
        )
        # height
        h = _gate(
            h,
            x,
            Conv(d, (1, 5, 1), dtype=self.dtype),
            Conv(d, (1, 5, 1), dtype=self.dtype),
            Conv(d, (1, 5, 1), dtype=self.dtype),
        )
        # time
        h = _gate(
            h,
            x,
            Conv(d, (5, 1, 1), dtype=self.dtype),
            Conv(d, (5, 1, 1), dtype=self.dtype),
            Conv(d, (5, 1, 1), dtype=self.dtype),
        )
        return h


class SepConvGRU3D(nn.Module):
    """Plain 3-D separable GRU (reference ppmtereo_update.py:315-369)."""

    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        for k in ((1, 1, 5), (1, 5, 1), (5, 1, 1)):
            h = _gate(
                h,
                x,
                Conv(d, k, dtype=self.dtype),
                Conv(d, k, dtype=self.dtype),
                Conv(d, k, dtype=self.dtype),
            )
        return h
