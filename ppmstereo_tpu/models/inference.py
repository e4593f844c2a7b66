"""Sliding-window inference over arbitrary-length stereo videos.

Re-design of the reference `forward_batch_test`
(/root/reference/models/core/ppmstereo.py:238-320): overlapping windows of
`kernel_size` frames with stride kernel_size//2, stitched by trimming
stride//2 frames from window edges; a whole-clip fast path when the video
is shorter than one window. Same trim arithmetic, same |disparity| output.

TPU-native differences:
  * each distinct window length jits exactly once (a full video reuses
    two compiled graphs: body windows and the tail window);
  * padding to /32 happens inside the jitted function (static shapes);
  * outputs are fetched asynchronously — device compute of window i+1
    overlaps the host copy of window i.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.ops.padding import InputPadder


class SlidingWindowPredictor:
    """Drives a test-mode window function over long videos.

    window_fn(left, right) -> (disparity (1,T,H,W,1), uncertainty like it),
    where left/right are (1, T, H, W, 3) in [0, 255]. The predictor pads
    H/W to /32, jits per window length, and stitches.
    """

    def __init__(
        self,
        window_fn: Callable,
        kernel_size: int = 20,
        divis_by: int = 32,
    ):
        self.window_fn = window_fn
        self.kernel_size = kernel_size
        self.divis_by = divis_by
        self._jitted: dict[tuple, Callable] = {}

    def _run_window(self, left: jax.Array, right: jax.Array):
        """left/right: (T, H, W, 3). Returns (disp, unc): (T, H, W, 1)."""
        t, h, w, _ = left.shape
        key = (t, h, w)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)

            def fn(l, r):
                lp, rp = padder.pad(l, r)
                disp, unc = self.window_fn(lp[None], rp[None])
                return padder.unpad(disp[0]), padder.unpad(unc[0])

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](left, right)

    def __call__(self, stereo_video) -> dict[str, np.ndarray]:
        """stereo_video: (N, 2, H, W, 3) in [0, 255] (numpy or jax).

        Returns {"disparity": (N, H, W, 1), "uncertainties": (N, H, W, 1)}
        as numpy, disparity as absolute values (reference :309-310).
        """
        video = np.asarray(stereo_video)
        num_ims = len(video)
        k = self.kernel_size
        stride = k // 2

        if k > num_ims:
            disp, unc = self._run_window(
                jnp.asarray(video[:, 0]), jnp.asarray(video[:, 1])
            )
            return {
                "disparity": np.abs(np.asarray(disp)),
                "uncertainties": np.abs(np.asarray(unc)),
            }

        disp_parts, unc_parts = [], []
        pending = []  # (disp, unc, full_window) device results, fetched lazily
        for i in range(0, num_ims, stride):
            window = video[i : min(i + k, num_ims)]
            if i > 0 and len(window) < stride:
                continue  # reference skips tails shorter than a stride
            disp, unc = self._run_window(
                jnp.asarray(window[:, 0]), jnp.asarray(window[:, 1])
            )
            pending.append((i, len(window), disp, unc))

        for i, wlen, disp, unc in pending:
            disp = np.asarray(disp)
            unc = np.asarray(unc)
            if i == 0:
                # first window: trim the trailing stride//2 (reference :306)
                disp_parts.append(disp[: -(stride // 2)])
                unc_parts.append(unc[: -(stride // 2)])
            elif wlen < k:
                disp_parts.append(disp[stride // 2 :])
                unc_parts.append(unc[stride // 2 :])
            else:
                disp_parts.append(disp[stride // 2 : -(stride // 2)])
                unc_parts.append(unc[stride // 2 : -(stride // 2)])

        return {
            "disparity": np.abs(np.concatenate(disp_parts)),
            "uncertainties": np.abs(np.concatenate(unc_parts)),
        }
