"""RAFT-style convex upsampling, 2-D and 3-D, channels-last.

The reference implements the 3-D variant with the external `unfoldNd`
im2col library plus a 9-D reshape dance
(/root/reference/models/core/ppmstereo.py:185-228). On TPU a 27-tap
weighted sum is just 27 static shifted slices fused by XLA into one
elementwise pass — no gather, no im2col materialization.

Mask channel layouts match the reference views exactly:
  2-D: (..., 9 * r * r)  laid out as [tap(9), ry, rx]
  3-D: (..., 27 * r * r) laid out as [tap(27), ry, rx]
Taps are row-major over the (dt,) dy, dx neighborhood offsets in
{-1, 0, 1}. Neighborhoods use zero padding (torch F.unfold / unfoldNd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighborhood_2d(x: jax.Array) -> jax.Array:
    """Stack the 3x3 zero-padded neighborhood: (B,H,W,C) -> (B,H,W,9,C)."""
    h, w = x.shape[-3], x.shape[-2]
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    taps = [
        xp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
    ]
    return jnp.stack(taps, axis=-2)


def _neighborhood_3d(x: jax.Array) -> jax.Array:
    """Stack the 3x3x3 neighborhood: (B,T,H,W,C) -> (B,T,H,W,27,C)."""
    t, h, w = x.shape[-4], x.shape[-3], x.shape[-2]
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    taps = [
        xp[:, dt : dt + t, dy : dy + h, dx : dx + w, :]
        for dt in range(3)
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(taps, axis=-2)


def _pixel_shuffle(up: jax.Array, rate: int) -> jax.Array:
    """(..., H, W, r*r, C) -> (..., H*r, W*r, C) with [ry, rx] subpixel order."""
    *lead, h, w, rr, c = up.shape
    up = up.reshape(*lead, h, w, rate, rate, c)
    # (..., H, ry, W, rx, C)
    perm = list(range(len(lead))) + [
        len(lead),
        len(lead) + 2,
        len(lead) + 1,
        len(lead) + 3,
        len(lead) + 4,
    ]
    up = up.transpose(perm)
    return up.reshape(*lead, h * rate, w * rate, c)


def convex_upsample_2d(flow: jax.Array, mask: jax.Array, rate: int = 4) -> jax.Array:
    """flow (B,H,W,2), mask (B,H,W,9*r*r) -> (B,H*r,W*r,2).

    Per output subpixel, a softmax-convex combination of the 3x3
    neighborhood of rate*flow (reference ppmstereo.py:185-197).
    """
    b, h, w, _ = flow.shape
    weights = jax.nn.softmax(
        mask.reshape(b, h, w, 9, rate * rate).astype(jnp.float32), axis=-2
    )
    nb = _neighborhood_2d(rate * flow.astype(jnp.float32))  # (B,H,W,9,2)
    up = jnp.einsum("bhwkr,bhwkc->bhwrc", weights, nb)
    return _pixel_shuffle(up, rate)


def convex_upsample_3d(flow: jax.Array, mask: jax.Array, rate: int = 4) -> jax.Array:
    """flow (B,T,H,W,2), mask (B,T,H,W,27*r*r) -> (B,T,H*r,W*r,2).

    3-D (t,h,w) convex upsampling; only H and W are upsampled — the 27
    taps pull temporal context into every output subpixel
    (reference ppmstereo.py:199-228).
    """
    b, t, h, w, _ = flow.shape
    weights = jax.nn.softmax(
        mask.reshape(b, t, h, w, 27, rate * rate).astype(jnp.float32), axis=-2
    )
    nb = _neighborhood_3d(rate * flow.astype(jnp.float32))  # (B,T,H,W,27,2)
    up = jnp.einsum("bthwkr,bthwkc->bthwrc", weights, nb)
    return _pixel_shuffle(up, rate)
