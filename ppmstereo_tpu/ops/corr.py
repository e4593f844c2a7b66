"""All-pairs 1-D (epipolar) correlation volume + pyramid lookup.

TPU-native re-design of the reference CorrBlock1D
(/root/reference/models/core/corr.py:55-104):

  * The volume is one big batched matmul over the feature dim — it lands on
    the MXU directly (the reference uses a torch einsum).
  * The pyramid is built by average pooling only the *last* (W2) axis.
  * The lookup replaces CUDA grid_sample with a vectorized 1-D two-tap
    gather: the y axis of the reference lookup is degenerate (corr.py:18
    asserts a single row), so sampling the pyramid is a pure 1-D linear
    interpolation along W2 with zero padding — gathers + a lerp, no
    scatter, no dynamic shapes.

Also contains TFCL (BiDAStereo) and AAPC (StereoAnyVideo) patch
correlations (corr.py:109-236), which are shifted elementwise products —
pure VPU work that XLA fuses.

All tensors channels-last. fmap: (B, H, W, C). corr volume: (B, H, W1, W2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.ops.geometry import avg_pool_w


def corr_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """All-pairs correlation along the epipolar line.

    (B,H,W1,C) x (B,H,W2,C) -> (B,H,W1,W2), scaled by 1/sqrt(C)
    (reference corr.py:96-104). MXU matmul with f32 accumulation; the
    result is stored back in the feature dtype — under mixed precision
    that is bf16, exactly the reference's autocast behavior (its einsum
    runs inside the bf16 autocast region, ppmstereo.py:617+corr.py:102)
    and the difference between a 14.7 GB and 7.4 GB pyramid at 720p.
    """
    c = fmap1.shape[-1]
    corr = jnp.einsum(
        "bhic,bhjc->bhij", fmap1, fmap2, preferred_element_type=jnp.float32
    )
    return (corr / jnp.sqrt(jnp.float32(c))).astype(fmap1.dtype)


def build_corr_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> list[jax.Array]:
    """Build the lookup pyramid: level i has W2/2^i columns.

    The reference builds num_levels+1 entries but only reads the first
    num_levels (corr.py:69-72 vs :81), so we build exactly what is read.
    """
    corr = corr_volume(fmap1, fmap2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool_w(corr, 2, 2)
        pyramid.append(corr)
    return pyramid


def _lookup_level_gather(corr: jax.Array, x: jax.Array, radius: int) -> jax.Array:
    """Two-tap lerp via take_along_axis — fast on CPU, but a gather along
    the LANE axis scalarizes on TPU (measured: hangs at production sizes).
    Kept as the CPU path and as the parity oracle for the one-hot path."""
    w2 = corr.shape[-1]
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    pos = x[..., None].astype(jnp.float32) + dx
    i0 = jnp.floor(pos)
    frac = pos - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1

    def tap(idx):
        valid = (idx >= 0) & (idx < w2)
        safe = jnp.clip(idx, 0, w2 - 1)
        vals = jnp.take_along_axis(corr, safe, axis=-1)
        return jnp.where(valid, vals, 0.0)

    return tap(i0) * (1.0 - frac) + tap(i1) * frac


def _lookup_level_onehot(corr: jax.Array, x: jax.Array, radius: int) -> jax.Array:
    """TPU path: the per-pixel two-tap gather re-expressed as a masked
    reduction over W2 — iota-compare one-hot weights fused with the
    multiply-reduce on the VPU, no gather instruction at all. Exactly
    equal to the gather path (0/1 masks select the same two taps; OOB
    indices produce an all-zero mask == grid_sample zero padding)."""
    w2 = corr.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w2), 3)
    outs = []
    x = x.astype(jnp.float32)
    for dx in range(-radius, radius + 1):
        pos = x + dx
        i0f = jnp.floor(pos)
        frac = (pos - i0f)[..., None]
        i0 = i0f.astype(jnp.int32)[..., None]
        w = (j == i0).astype(corr.dtype) * (1.0 - frac) + (
            j == i0 + 1
        ).astype(corr.dtype) * frac
        outs.append(jnp.sum(corr * w, axis=-1))
    return jnp.stack(outs, axis=-1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def corr_lookup(
    pyramid: list[jax.Array],
    coords_x: jax.Array,
    radius: int = 4,
    impl: str = "auto",
) -> jax.Array:
    """Pyramid lookup: coords_x (B,H,W1) -> (B,H,W1, L*(2r+1)) features.

    Channel order is level-major then dx in [-r, r], matching the reference
    concat order (corr.py:81-93). impl: "auto" | "gather" | "onehot".
    """
    if impl == "auto":
        impl = "onehot" if _on_tpu() else "gather"
    level = _lookup_level_onehot if impl == "onehot" else _lookup_level_gather
    out = [
        level(corr, coords_x / (2.0**i), radius)
        for i, corr in enumerate(pyramid)
    ]
    return jnp.concatenate(out, axis=-1)


def _shift_slice(x_pad: jax.Array, dy: int, dx: int, h: int, w: int) -> jax.Array:
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(x_pad, dy, h, axis=-3), dx, w, axis=-2
    )


def _edge_pad_hw(x: jax.Array, pady: int, padx: int) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    pad[x.ndim - 3] = (pady, pady)
    pad[x.ndim - 2] = (padx, padx)
    return jnp.pad(x, pad, mode="edge")


def bilinear_sample_2d(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Full 2-D bilinear sample in pixel coords, channels-last.

    img: (B,H,W,C); coords: (B,H',W',2) with (x, y) order. Zero padding,
    align_corners=True semantics (parity with
    reference corr.py:30-45 bilinear_sampler_bidastereo).
    """
    h, w = img.shape[-3], img.shape[-2]
    x, y = coords[..., 0], coords[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0f, y - y0f
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)

    def tap(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        sx = jnp.clip(ix, 0, w - 1)
        sy = jnp.clip(iy, 0, h - 1)
        flat = sy * w + sx  # (B,H',W')
        img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
        vals = jnp.take_along_axis(
            img_flat[:, None, :, :],
            flat.reshape(flat.shape[0], 1, -1, 1),
            axis=2,
        )
        vals = vals.reshape(*flat.shape, img.shape[-1])
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def tfcl_correlation(
    left: jax.Array,
    rights_warped: tuple[jax.Array, jax.Array, jax.Array],
    psize: tuple[int, int] = (1, 9),
) -> jax.Array:
    """Triple-frame correlation layer (BiDAStereo, corr.py:109-168).

    left: (B,H,W,C); rights_warped: three temporally-aligned right features
    already warped to the left frame. Output (B,H,W,3*py*px), channel-mean
    shifted products with replicate padding.
    """
    h, w = left.shape[-3], left.shape[-2]
    pady, padx = psize[0] // 2, psize[1] // 2
    outs = []
    for right in rights_warped:
        right_pad = _edge_pad_hw(right, pady, padx)
        for dy in range(psize[0]):
            for dx in range(psize[1]):
                crop = _shift_slice(right_pad, dy, dx, h, w)
                outs.append(jnp.mean(left * crop, axis=-1))
    return jnp.stack(outs, axis=-1)


def aapc_correlation(
    left: jax.Array, right_warped: jax.Array, psize: tuple[int, int] = (1, 9)
) -> jax.Array:
    """All-in-all-pair correlation (StereoAnyVideo, corr.py:172-236).

    Channels split into 4 groups; doubly-shifted channel-sum products.
    Output (B,H,W, 4*(py*px)^2).
    """
    h, w = left.shape[-3], left.shape[-2]
    c = left.shape[-1]
    pady, padx = psize[0] // 2, psize[1] // 2
    outs = []
    for g in range(4):
        lg = left[..., g * (c // 4) : (g + 1) * (c // 4)]
        rg = right_warped[..., g * (c // 4) : (g + 1) * (c // 4)]
        lpad = _edge_pad_hw(lg, pady, padx)
        rpad = _edge_pad_hw(rg, pady, padx)
        for dy1 in range(psize[0]):
            for dx1 in range(psize[1]):
                lcrop = _shift_slice(lpad, dy1, dx1, h, w)
                for dy2 in range(psize[0]):
                    for dx2 in range(psize[1]):
                        rcrop = _shift_slice(rpad, dy2, dx2, h, w)
                        outs.append(jnp.sum(lcrop * rcrop, axis=-1))
    return jnp.stack(outs, axis=-1)
