"""Temporal-FFT flow head (experimental surface of the reference).

Re-design of /root/reference/models/core/ppmtereo_update.py:681-788
(FlowHead3D_FFT, FFTLMul, FFTLinear, FFTBatchNorm, Temporal_FFT): the
clip's feature spectrum along the frame axis is modulated by a learned
input-conditioned complex filter, reconstructed by iFFT, and decoded to
delta-flow. Unused by the shipped config but part of the component
inventory (SURVEY.md §2.2); kept functional and tested.

Complex weights are stored as trailing-2 float parameters (torch
view_as_complex convention) so checkpoints map 1:1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv


def _as_complex(x):
    return jax.lax.complex(x[..., 0], x[..., 1])


class FFTLinear(nn.Module):
    """Complex channel-mixing linear over the spectrum
    (ppmtereo_update.py:705-727)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # x: complex (B, T, H, W, C_in)
        c_in = x.shape[-1]
        w = self.param(
            "complex_weight",
            nn.initializers.normal(0.02),
            (self.features, c_in, 2),
        )
        wc = _as_complex(w)  # (C_out, C_in)
        return jnp.einsum("oc,bthwc->bthwo", wc, x)


class FFTBatchNorm(nn.Module):
    """Feature norm on the interleaved real/imag view
    (ppmtereo_update.py:729-746): BatchNorm3d(affine=False) over
    (B, T, H, W*2) per channel — instance-style stats here (no running
    stats; the reference path is train-time only)."""

    @nn.compact
    def __call__(self, x):
        # x complex (B,T,H,W,C) -> stats over real/imag jointly
        re, im = jnp.real(x), jnp.imag(x)
        stacked = jnp.stack([re, im], axis=-2)  # (B,T,H,W,2,C)
        mean = jnp.mean(stacked, axis=(1, 2, 3, 4), keepdims=True)
        var = jnp.var(stacked, axis=(1, 2, 3, 4), keepdims=True)
        normed = (stacked - mean) / jnp.sqrt(var + 1e-5)
        return jax.lax.complex(normed[..., 0, :], normed[..., 1, :])


class TemporalFFT(nn.Module):
    """Spectrum modulation block (ppmtereo_update.py:749-788)."""

    input_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C) real
        b, t, h, w, c = x.shape
        x32 = x.astype(jnp.float32)
        x_t = jnp.fft.fft(x32, axis=1, norm="ortho")  # complex (B,T,H,W,C)

        # input-conditioned filter: 2 x 3x3x3 convs -> (B,T,H,W,2C)
        g = Conv(2 * c, (3, 3, 3), use_bias=False, dtype=self.dtype, name="filter_g1")(x)
        g = nn.relu(g)
        g = Conv(2 * c, (3, 3, 3), use_bias=False, dtype=self.dtype, name="filter_g2")(g)
        g = g.astype(jnp.float32).reshape(b, t, h, w, c, 2)
        filt = _as_complex(g)

        y = x_t * filt
        y = FFTLinear(c, dtype=self.dtype, name="linear1")(y)
        y = FFTBatchNorm(name="norm1")(y)

        alpha = self.param("alpha1", nn.initializers.zeros, (1, 1, 1, 1, c))
        out = jnp.fft.ifft(y * alpha, n=t, axis=1, norm="ortho")
        return x32 + out  # complex; caller takes .abs() per reference


class FlowHead3DFFT(nn.Module):
    """FFT-modulated 3-D flow head (ppmtereo_update.py:681-692)."""

    hidden_dim: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x_t = jnp.abs(TemporalFFT(c, dtype=self.dtype, name="temporal")(x))
        x_t = x_t.astype(x.dtype)
        y = Conv(
            self.hidden_dim, (1, 5, 5), use_bias=False, dtype=self.dtype, name="conv1"
        )(x_t)
        y = nn.relu(y)
        return Conv(2, (1, 3, 3), use_bias=False, dtype=self.dtype, name="conv2")(y)
