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


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(in_size, out_size) two-tap linear interpolation matrix matching
    torch F.interpolate(mode="bilinear") tap positions for the given
    align_corners flag (clip-to-edge out-of-range taps)."""
    if align_corners:
        if out_size == 1 or in_size == 1:
            pos = np.zeros((out_size,), dtype=np.float64)
        else:
            pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        pos = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    i0 = np.floor(pos).astype(np.int64)
    w1 = (pos - i0).astype(np.float32)
    i0c = np.clip(i0, 0, in_size - 1)
    i1c = np.clip(i0 + 1, 0, in_size - 1)
    cols = np.arange(out_size)
    mat = np.zeros((in_size, out_size), dtype=np.float32)
    np.add.at(mat, (i0c, cols), 1.0 - w1)
    np.add.at(mat, (i1c, cols), w1)
    return mat


def two_tap_resize_1d(
    x: jax.Array, axis: int, out_size: int, align_corners: bool
) -> jax.Array:
    """Linear resize along one axis (torch interp parity), expressed as a
    contraction with a constant two-tap matrix rather than index gathers:
    the GSPMD partitioner reshards static-index gathers by full
    rematerialization (replicate-then-partition) on batch/seq/space
    meshes, while a dot_general passes every non-contracted sharded axis
    straight through — and the MXU runs it for free at these sizes. Each
    matrix column holds exactly the two lerp taps, so for float inputs
    (HIGHEST precision, f32 accumulation) the result equals the two-tap
    gather formulation.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    axis = axis % x.ndim
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # integer/bool inputs: lerp in f32, cast back (the matrix path
        # requires a float contraction dtype)
        return two_tap_resize_1d(
            x.astype(jnp.float32), axis, out_size, align_corners
        ).astype(x.dtype)
    mat = _resize_matrix(in_size, out_size, align_corners)
    y = jax.lax.dot_general(
        x,
        jnp.asarray(mat, dtype=x.dtype),
        dimension_numbers=(((axis,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    # dot_general appends the new axis last; restore its position
    return jnp.moveaxis(y, -1, axis)


def _linear_resize_1d(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    return two_tap_resize_1d(x, axis, out_size, align_corners=True)


def interp_ac_false(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=False resize of (..., H, W, C) to out_hw —
    torch F.interpolate default semantics (uncertainty-map and VDA
    feature resizes)."""
    h, w = out_hw
    x = two_tap_resize_1d(x, x.ndim - 3, h, align_corners=False)
    x = two_tap_resize_1d(x, x.ndim - 2, w, align_corners=False)
    return x


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
