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


def scale_shift_align(prev_overlap: np.ndarray, new_overlap: np.ndarray):
    """Least-squares (scale, shift) aligning `new` onto `prev` over the
    shared frames — the Video-Depth-Anything keyframe alignment pattern
    (reference video_depth.py:124-160) applied to disparity windows."""
    x = new_overlap.reshape(-1).astype(np.float64)
    y = prev_overlap.reshape(-1).astype(np.float64)
    var = x.var()
    if var < 1e-12:
        return 1.0, float(y.mean() - x.mean())
    a = float(((x - x.mean()) * (y - y.mean())).mean() / var)
    b = float(y.mean() - a * x.mean())
    return a, b


class SlidingWindowPredictor:
    """Drives a test-mode window function over long videos.

    window_fn(left, right) -> (disparity (1,T,H,W,1), uncertainty like it),
    where left/right are (1, T, H, W, 3) in [0, 255]. The predictor pads
    H/W to /32, jits per window length, and stitches.

    align_windows=True additionally scale/shift-aligns each window onto
    its predecessor over the overlapping frames before trimming — the
    VDA streaming consistency pass the reference applies to long videos
    (video_depth.py:96-160); off by default for strict reference parity.
    """

    def __init__(
        self,
        window_fn: Callable,
        kernel_size: int = 20,
        divis_by: int = 32,
        align_windows: bool = False,
    ):
        self.window_fn = window_fn
        self.kernel_size = kernel_size
        self.divis_by = divis_by
        self.align_windows = align_windows
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

        prev_disp = None
        prev_start = None
        for i, wlen, disp, unc in pending:
            disp = np.asarray(disp)
            unc = np.asarray(unc)
            if self.align_windows and prev_disp is not None:
                # overlap between window starting at prev_start and this one
                ov = prev_start + len(prev_disp) - i
                if ov > 0:
                    a, b = scale_shift_align(prev_disp[-ov:], disp[:ov])
                    disp = a * disp + b
            prev_disp, prev_start = disp, i
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
