"""Normalization layers with torch-parity semantics."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False) parity on (..., H, W, C).

    Normalizes each channel over its spatial extent per sample, no learned
    affine (the reference always uses affine=False, extractor.py:325-327).
    Stats in f32 regardless of compute dtype.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 3, x.ndim - 1))  # (H, W)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        return ((x32 - mean) / jnp.sqrt(var + self.epsilon)).astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps matching ConvNeXt (1e-6)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=x.dtype, param_dtype=jnp.float32)(x)
