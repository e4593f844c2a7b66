"""Stateless geometric primitives, channels-last, jit-friendly.

Functional equivalents of the reference's torch helpers
(/root/reference/models/core/utils/utils.py:10-16 `interp`,
 /root/reference/models/core/corr.py:47-52 `coords_grid`,
 torch F.avg_pool2d / nn.AdaptiveMaxPool2d / nn.Upsample(nearest)),
re-expressed as pure XLA ops on NHWC arrays so they fuse and tile onto the
TPU VPU/MXU. All shapes are static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def coords_grid_x(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Per-pixel x coordinate, shape (batch, ht, wd).

    The stereo problem only transports the x coordinate (the reference keeps
    a full 2-channel grid, corr.py:47-52, but only row-constant x survives
    the epipolar lookup), so we carry x alone — half the bandwidth.
    """
    x = jnp.arange(wd, dtype=dtype)[None, None, :]
    return jnp.broadcast_to(x, (batch, ht, wd))


def _linear_resize_1d(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    """align_corners=True linear resize along one axis (torch interp parity)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1:
        pos = np.zeros((1,), dtype=np.float64)
    elif in_size == 1:
        pos = np.zeros((out_size,), dtype=np.float64)
    else:
        pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (pos - i0).astype(np.float32)

    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    w1 = jnp.asarray(w1).reshape(wshape).astype(x.dtype)
    return x0 * (1 - w1) + x1 * w1


def interp_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True resize of (..., H, W, C) to out_hw.

    Matches torch F.interpolate(mode="bilinear", align_corners=True)
    (reference utils.py:10-16) — separable two-tap gathers, fused by XLA.
    """
    h, w = out_hw
    x = _linear_resize_1d(x, x.ndim - 3, h)
    x = _linear_resize_1d(x, x.ndim - 2, w)
    return x


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """2x nearest-neighbor upsample of (..., H, W, C) (torch nn.Upsample)."""
    x = jnp.repeat(x, 2, axis=x.ndim - 3)
    x = jnp.repeat(x, 2, axis=x.ndim - 2)
    return x


def avg_pool2d(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """Average pool over the (H, W) axes of (..., H, W, C).

    window == stride (the only case the pipeline uses) lowers to a
    reshape+mean — a pure layout op plus a reduction, trivially
    differentiable and fusion-friendly.
    """
    stride = stride or window
    if stride != window:
        dims = [1] * x.ndim
        strides = [1] * x.ndim
        dims[x.ndim - 3] = dims[x.ndim - 2] = window
        strides[x.ndim - 3] = strides[x.ndim - 2] = stride
        summed = jax.lax.reduce_window(
            x, jnp.array(0, x.dtype), jax.lax.add, dims, strides, "VALID"
        )
        return summed / jnp.array(window * window, x.dtype)
    *lead, h, w, c = x.shape
    hh, ww = h // window, w // window
    x = x[..., : hh * window, : ww * window, :]
    x = x.reshape(*lead, hh, window, ww, window, c)
    return jnp.mean(x, axis=(-4, -2))


def avg_pool_w(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """Average pool along the last axis (the 1-D corr pyramid)."""
    assert window == stride == 2
    *lead, n = x.shape
    nn_ = n // 2
    x = x[..., : nn_ * 2].reshape(*lead, nn_, 2)
    return jnp.mean(x, axis=-1)


def _adaptive_bounds(in_size: int, out_size: int) -> list[tuple[int, int]]:
    return [
        (int(np.floor(i * in_size / out_size)), int(np.ceil((i + 1) * in_size / out_size)))
        for i in range(out_size)
    ]


def adaptive_max_pool2d(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch nn.AdaptiveMaxPool2d parity on (..., H, W, C).

    Used by the QAM similarity scorer (reference ppmstereo.py:406). Max
    pooling is separable, so non-uniform adaptive windows become two passes
    of static-slice maxima that XLA fuses; when the size divides evenly this
    lowers to a plain strided reduce_window.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if h_in % h_out == 0 and w_in % w_out == 0:
        kh, kw = h_in // h_out, w_in // w_out
        *lead, _, _, c = x.shape
        xr = x.reshape(*lead, h_out, kh, w_out, kw, c)
        return jnp.max(xr, axis=(-4, -2))
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    rows = [
        jnp.max(jax.lax.slice_in_dim(x, s, e, axis=h_axis), axis=h_axis)
        for s, e in _adaptive_bounds(h_in, h_out)
    ]
    x = jnp.stack(rows, axis=h_axis)
    # after stacking, W sits at the same axis index
    cols = [
        jnp.max(jax.lax.slice_in_dim(x, s, e, axis=w_axis), axis=w_axis)
        for s, e in _adaptive_bounds(w_in, w_out)
    ]
    return jnp.stack(cols, axis=w_axis)


@functools.partial(jax.jit, static_argnames=("eps",))
def cosine_similarity_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pairwise cosine similarity: a (B,T,D), b (B,T,D) -> (B,T,T).

    out[b, i, j] = cos(a[b, j], b[b, i])  — matches the reference's
    F.cosine_similarity(q.unsqueeze(1), k.unsqueeze(2)) orientation
    (ppmstereo.py:412): row index comes from k, column from q.
    """
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.einsum("bjd,bid->bij", an, bn)
