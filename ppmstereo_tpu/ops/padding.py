"""Pad video frames so H and W divide a required multiple.

Functional re-design of the reference InputPadder
(/root/reference/models/core/utils/utils.py:19-44): same 'sintel'
(split top/bottom, left/right) geometry and replicate padding, but pure
functions over channels-last arrays, safe to close over in a jitted
sliding-window driver (pad sizes are static per input shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class InputPadder:
    def __init__(self, ht: int, wd: int, divis_by: int = 32, mode: str = "sintel"):
        self.ht, self.wd = ht, wd
        pad_ht = (((ht // divis_by) + 1) * divis_by - ht) % divis_by
        pad_wd = (((wd // divis_by) + 1) * divis_by - wd) % divis_by
        if mode == "sintel":
            # (left, right, top, bottom)
            self._pad = (
                pad_wd // 2,
                pad_wd - pad_wd // 2,
                pad_ht // 2,
                pad_ht - pad_ht // 2,
            )
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    @property
    def padded_hw(self) -> tuple[int, int]:
        l, r, t, b = self._pad
        return self.ht + t + b, self.wd + l + r

    def pad(self, *inputs: jax.Array) -> list[jax.Array]:
        """Pad (..., H, W, C) arrays with replicate (edge) padding."""
        l, r, t, b = self._pad
        out = []
        for x in inputs:
            cfg = [(0, 0)] * x.ndim
            cfg[x.ndim - 3] = (t, b)
            cfg[x.ndim - 2] = (l, r)
            out.append(jnp.pad(x, cfg, mode="edge"))
        return out

    def unpad(self, x: jax.Array) -> jax.Array:
        l, r, t, b = self._pad
        h, w = x.shape[-3], x.shape[-2]
        return x[..., t : h - b, l : w - r, :]
