"""Parallel sliding-window streaming over the device mesh.

The reference processes long videos strictly sequentially — one
overlapping window at a time on one GPU (ppmstereo.py:277-307). The
TPU-native replacement exploits that windows are independent given the
trim arithmetic: PACK windows into a batch axis and shard that axis over
the `data` dimension of the mesh, so an N-device slice advances N windows
per step (the window-pipelining/PP analog of SURVEY.md §2.10 item 4).
Within a window, the frame axis can additionally shard over `seq`.

For multi-host 100+-frame sequences (BASELINE.json config #5) the same
code runs under jax.distributed: each host feeds its local shard of the
window batch; stitching trims are pure host-side numpy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.inference import window_trim_bounds
from ppmstereo_tpu.ops.padding import InputPadder


class ParallelWindowPredictor:
    """Batched, mesh-sharded version of SlidingWindowPredictor.

    window_fn(left, right) must accept (B, T, H, W, 3) with any B and
    return (disp, unc) of shape (B, T, H, W, 1).
    """

    def __init__(
        self,
        window_fn: Callable,
        mesh: Mesh,
        kernel_size: int = 20,
        divis_by: int = 32,
    ):
        self.window_fn = window_fn
        self.mesh = mesh
        self.kernel_size = kernel_size
        self.divis_by = divis_by
        self.windows_per_step = int(mesh.shape["data"])
        self._jitted = {}

    def _run_batch(self, lefts: np.ndarray, rights: np.ndarray):
        """lefts: (B, T, H, W, 3) — B full windows at once. Pads B up to
        the data-axis size so the sharding always divides.

        Multi-host (jax.process_count() > 1): every host holds the full
        window batch (the stitched video is replicated, as in the
        sequential driver); inputs are assembled into global arrays via
        make_array_from_callback so each host feeds only its addressable
        window shards, and outputs are jit-replicated (an all-gather over
        `data`) so every host can stitch the full video — the multi-host
        streaming contract of BASELINE config #5, verified 2-process by
        tests/test_distributed_2proc.py."""
        dp = self.windows_per_step
        orig_b = lefts.shape[0]
        if orig_b % dp:
            pad = dp - orig_b % dp
            lefts = np.concatenate([lefts, np.repeat(lefts[-1:], pad, 0)])
            rights = np.concatenate([rights, np.repeat(rights[-1:], pad, 0)])
        bsz, t, h, w, _ = lefts.shape
        key = (bsz, t, h, w)
        multiproc = jax.process_count() > 1
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)
            # tail windows shorter than the kernel may not divide the
            # seq axis — run those seq-replicated (frame-padding would
            # break parity: SST/pick see the frame count). Same guard
            # for rows vs space (h is padded to /32, so this only
            # triggers on exotic meshes).
            seq = "seq" if t % self.mesh.shape.get("seq", 1) == 0 else None
            space = (
                "space" if h % self.mesh.shape.get("space", 1) == 0
                else None
            )
            sharding = NamedSharding(self.mesh, P("data", seq, space))

            def fn(l, r):
                lp, rp = padder.pad(l, r)
                disp, unc = self.window_fn(lp, rp)
                return padder.unpad(disp), padder.unpad(unc)

            rep = NamedSharding(self.mesh, P())
            jfn = jax.jit(
                fn,
                in_shardings=(sharding, sharding),
                out_shardings=(rep, rep) if multiproc else None,
            )
            self._jitted[key] = (jfn, sharding)
        fn, sharding = self._jitted[key]
        if multiproc:
            l = jax.make_array_from_callback(
                lefts.shape, sharding, lambda idx: lefts[idx]
            )
            r = jax.make_array_from_callback(
                rights.shape, sharding, lambda idx: rights[idx]
            )
        else:
            l = jax.device_put(jnp.asarray(lefts), sharding)
            r = jax.device_put(jnp.asarray(rights), sharding)
        with self.mesh:  # ambient mesh: model bank-sharding hints
            disp, unc = fn(l, r)
        return disp[:orig_b], unc[:orig_b]

    def __call__(self, stereo_video) -> dict[str, np.ndarray]:
        video = np.asarray(stereo_video)
        num_ims = len(video)
        k = self.kernel_size
        stride = k // 2

        if k > num_ims:
            disp, unc = self._run_batch(
                video[None, :, 0], video[None, :, 1]
            )
            return {
                "disparity": np.abs(np.asarray(disp[0])),
                "uncertainties": np.abs(np.asarray(unc[0])),
            }

        # collect window extents (same trim arithmetic as the sequential
        # driver / reference :296-307)
        wins = []
        for i in range(0, num_ims, stride):
            window = video[i : min(i + k, num_ims)]
            if i > 0 and len(window) < stride:
                continue
            wins.append((i, len(window)))

        # full-length windows batch together; odd tails run alone
        full = [w for w in wins if w[1] == k]
        tails = [w for w in wins if w[1] != k]

        results: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        bsz = self.windows_per_step
        for s in range(0, len(full), bsz):
            chunk = full[s : s + bsz]
            pad_n = bsz - len(chunk)
            lefts = np.stack(
                [video[i : i + k, 0] for i, _ in chunk]
                + [video[:k, 0]] * pad_n
            )
            rights = np.stack(
                [video[i : i + k, 1] for i, _ in chunk]
                + [video[:k, 1]] * pad_n
            )
            disp, unc = self._run_batch(lefts, rights)
            disp, unc = np.asarray(disp), np.asarray(unc)
            for j, (i, _) in enumerate(chunk):
                results[i] = (disp[j], unc[j])
        for i, wlen in tails:
            disp, unc = self._run_batch(
                video[None, i : i + wlen, 0], video[None, i : i + wlen, 1]
            )
            results[i] = (np.asarray(disp[0]), np.asarray(unc[0]))

        disp_parts, unc_parts = [], []
        for i, wlen in wins:
            disp, unc = results[i]
            lo, hi = window_trim_bounds(i, wlen, k, stride)
            disp_parts.append(disp[lo : len(disp) - hi] if hi else disp[lo:])
            unc_parts.append(unc[lo : len(unc) - hi] if hi else unc[lo:])

        return {
            "disparity": np.abs(np.concatenate(disp_parts)),
            "uncertainties": np.abs(np.concatenate(unc_parts)),
        }
