"""Fused Pallas kernel for the correlation pyramid lookup.

One kernel launch computes all 4 levels x 9 taps of the epipolar lookup
(reference CorrBlock1D.__call__, corr.py:74-94): each grid step DMAs a
block of correlation rows into VMEM once and produces all 36 output
channels from it — the per-tap one-hot masked reductions (see
ops/corr.py::_lookup_level_onehot for the math and why gathers are
avoided) never round-trip HBM between taps.

Numerics are exactly the one-hot XLA path (and therefore exactly torch
grid_sample align_corners=True / zeros padding) — verified bit-exact on
TPU against ops/corr.py.

MEASURED (v5e, 1/4-scale shapes): this kernel runs 5.1 ms/lookup vs
1.6 ms for the XLA one-hot formulation — XLA's fusion of the
iota-compare reductions is already near-optimal, so the MODEL DEFAULTS
TO THE XLA PATH (ops.corr.corr_lookup). The kernel is kept as the
explicit-VMEM reference implementation and the starting point for a
future fused corr-volume+lookup (which would also remove the pyramid
from HBM for the 720p kernel_size=20 case).

Shapes: pyramid level l: (N, H, W1, W2/2^l); coords (N, H, W1) f32;
output (N, H, W1, levels*(2r+1)) f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(coords_ref, *refs, radius: int, num_levels: int):
    corr_refs = refs[:num_levels]
    out_ref = refs[num_levels]

    coords = coords_ref[0]  # (BH, W1) f32
    taps = 2 * radius + 1
    for lvl in range(num_levels):
        corr = corr_refs[lvl][0]  # (BH, W1, W2_l)
        w2 = corr.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w2), 2)
        x = coords * (0.5**lvl)
        for t in range(taps):
            pos = x + (t - radius)
            i0f = jnp.floor(pos)
            frac = (pos - i0f)[..., None]
            i0 = i0f.astype(jnp.int32)[..., None]
            w = (j == i0).astype(jnp.float32) * (1.0 - frac) + (
                j == i0 + 1
            ).astype(jnp.float32) * frac
            val = jnp.sum(corr.astype(jnp.float32) * w, axis=-1)
            out_ref[0, :, :, lvl * taps + t] = val


def corr_lookup_pallas(
    pyramid: list[jax.Array],
    coords_x: jax.Array,
    radius: int = 4,
    block_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.corr.corr_lookup on TPU."""
    n, h, w1 = coords_x.shape
    num_levels = len(pyramid)
    taps = 2 * radius + 1

    pad_h = (-h) % block_h
    if pad_h:
        coords_x = jnp.pad(coords_x, ((0, 0), (0, pad_h), (0, 0)))
        pyramid = [jnp.pad(c, ((0, 0), (0, pad_h), (0, 0), (0, 0))) for c in pyramid]
    hp = coords_x.shape[1]

    grid = (n, hp // block_h)
    in_specs = [
        pl.BlockSpec((1, block_h, w1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, block_h, w1, c.shape[-1]), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in pyramid
    ]
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, radius=radius, num_levels=num_levels),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_h, w1, num_levels * taps), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, w1, num_levels * taps), jnp.float32),
        interpret=interpret,
    )(coords_x.astype(jnp.float32), *pyramid)
    return out[:, :h]
