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
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ppmstereo_tpu.ops.padding import InputPadder


def window_trim_bounds(
    i: int, wlen: int, k: int, stride: int, fast_mode: bool = False
) -> tuple[int, int]:
    """Stitch-trim extents (lo, hi) for the window starting at frame i —
    the single source of truth for the reference's arithmetic
    (ppmstereo.py:296-307), shared by the sequential and mesh-parallel
    predictors.

    NB the reference trims `[stride//2 : -stride//2]` and Python floors
    the NEGATIVE division: -5//2 = -3, so the trailing trim is
    ceil(stride/2), not stride//2 — that asymmetry is what makes odd
    strides (kernel 10 -> stride 5) tile exactly.
    """
    tail = (stride + 1) // 2  # == -(-stride // 2)
    if fast_mode:
        # non-overlapping windows: every frame is kept untrimmed
        return 0, 0
    if i == 0:
        # first window: trim the trailing ceil(stride/2) (ref :306)
        return 0, tail
    if wlen < k:
        return stride // 2, 0
    return stride // 2, tail


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
        fast_mode: bool = False,
        batch_windows: int = 1,
        warm_window_fn: Callable | None = None,
        wire_dtype=None,
        max_inflight_windows: int = 8,
        fetch_uncertainty: bool = True,
        mesh: Mesh | None = None,
        encode_window_fn: Callable | None = None,
        body_window_fn: Callable | None = None,
        warm_body_window_fn: Callable | None = None,
    ):
        """fast_mode=True runs non-overlapping windows (stride ==
        kernel_size, no edge trimming) — ~2x throughput over the
        reference's stride = kernel_size // 2 overlap at the cost of
        losing the cross-window temporal context the overlap provides.
        Off by default for strict reference parity
        (reference ppmstereo.py:242).

        batch_windows=N executes up to N independent windows per device
        call as a batch axis — bit-identical stitching (windows never
        interact; same trim arithmetic), better MXU utilization on small
        per-window shapes, at N x activation memory.

        warm_window_fn(left, right, flow_init) enables warm-start
        windowing: every window after the first is seeded with the
        previous window's signed disparity (overlapping frames verbatim,
        new frames from the last overlapping frame) and runs only the
        final refinement stage — typically at a reduced iteration budget.
        Non-parity. The seed is assembled ON DEVICE from the previous
        window's device-resident output, so windows chain without a
        host round-trip and result fetches overlap later windows'
        compute (the axon tunnel downloads at ~15-25 MB/s — a blocking
        75 MB fetch per 720p window would dominate the warm savings).

        wire_dtype (e.g. jnp.float16) casts outputs on device before the
        host fetch — halves tunnel download bytes; results are upcast to
        float32 on host. None (default) keeps the exact f32 wire format
        (strict parity). Ignored when align_windows=True (the alignment
        regression needs full-precision full windows on host).

        max_inflight_windows bounds how many windows' staged outputs may
        live on device at once: the oldest is materialized to host when
        the bound is hit, so arbitrarily long videos run in O(bound)
        output HBM instead of O(video length).

        fetch_uncertainty=False drops the "uncertainties" output: the
        final 4x uncertainty upsample is dead-code-eliminated on device
        (the in-loop uncertainty head still runs — it feeds the PPM pick
        scores) and its wire copy is skipped, halving the download bytes.
        The disparity stream is bit-identical either way; consumers that
        only read disparity (the evaluator, the bench) should pass False.
        Default True keeps the reference's two-output contract
        (ppmstereo.py:309-310).

        mesh shards EACH WINDOW over the device mesh: frames over the
        `seq` axis, rows over `space` (and, in batch_windows mode, the
        window-batch over `data`). This is the multi-chip strict-parity
        inference mode — one 720p/k20/i20 window exceeds the single-chip
        FLOP ceiling (BENCH_NOTES "Roofline argument"), so the window
        itself is spread across chips; the PPM pick's top-k memory
        gathers become XLA all-gathers of the picked K/V blocks over ICI
        (SURVEY.md §2.10 items 2-3). Stitching, trims, warm chaining and
        output staging are unchanged — the sharded predictor is
        exact vs the sequential one (tests/test_sharded_inference.py).
        The caller must place the params the window_fn closes over as
        mesh-replicated arrays (jax.device_put(params, NamedSharding(
        mesh, P()))). Every shape runs under the default Shardy
        partitioner; stages whose space shards would be tinier than a
        conv halo replicate their rows inside the model
        (models/ppm_stereo.py::_tiny_row_shards)."""
        self.window_fn = window_fn
        self.warm_window_fn = warm_window_fn
        self.kernel_size = kernel_size
        self.divis_by = divis_by
        self.align_windows = align_windows
        self.fast_mode = fast_mode
        self.batch_windows = max(1, batch_windows)
        self.wire_dtype = wire_dtype
        self.max_inflight_windows = max(1, max_inflight_windows)
        self.fetch_uncertainty = fetch_uncertainty
        self.mesh = mesh
        # encoder caching (parity-free, device-chained): active when the
        # model provides a per-frame encode/body split AND windows
        # overlap (fast_mode has no shared frames to reuse) AND windows
        # run sequentially (batch mode computes windows together). Warm
        # mode composes when a warm body fn is provided — the warm seed
        # chain and the feature-cache chain ride the same dispatch.
        self.encode_window_fn = encode_window_fn
        self.body_window_fn = body_window_fn
        self.warm_body_window_fn = warm_body_window_fn
        self.encoder_cache = (
            encode_window_fn is not None
            and body_window_fn is not None
            and not fast_mode
            and batch_windows <= 1
            and (warm_window_fn is None or warm_body_window_fn is not None)
        )
        self._jitted: dict[tuple, Callable] = {}

    def _sharding(self, batched: bool = False):
        """NamedSharding for a (T, H, W, C) window (or (B, T, H, W, C)
        batch): T over `seq`, H over `space`, B over `data` — for axes
        the mesh defines. None when no mesh is set."""
        if self.mesh is None:
            return None
        seq = "seq" if "seq" in self.mesh.shape else None
        space = "space" if "space" in self.mesh.shape else None
        if batched:
            data = "data" if "data" in self.mesh.shape else None
            return NamedSharding(self.mesh, PartitionSpec(data, seq, space))
        return NamedSharding(self.mesh, PartitionSpec(seq, space))

    def _jit(self, fn, n_args: int, batched: bool = False,
             n_device_args: int = 0):
        """Mesh-mode jit: the first n_args inputs get the canonical
        window sharding; the trailing n_device_args are device-resident
        chain values (the warm seed) that keep whatever sharding the
        producing graph gave them."""
        sh = self._sharding(batched)
        if sh is None:
            return jax.jit(fn)
        jfn = jax.jit(
            fn, in_shardings=(sh,) * n_args + (None,) * n_device_args
        )

        # call (and therefore trace) under the mesh context so the
        # model's memory-bank sharding hints see the ambient mesh
        # (ppm_stereo._replicate_bank_over_seq)
        def call(*args):
            with self.mesh:
                return jfn(*args)

        return call

    @property
    def output_names(self) -> tuple[str, ...]:
        return (
            ("disparity", "uncertainties")
            if self.fetch_uncertainty
            else ("disparity",)
        )

    def _keep(self, outs):
        """Slice a window function's (disp, unc) to the fetched outputs —
        inside jit, so dropped outputs are dead-code-eliminated."""
        return tuple(outs) if self.fetch_uncertainty else (outs[0],)

    def _run_window(self, left: jax.Array, right: jax.Array):
        """left/right: (T, H, W, 3). Returns a tuple of (T, H, W, 1)
        outputs (disparity [, uncertainty])."""
        t, h, w, _ = left.shape
        key = (t, h, w)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)

            def fn(l, r):
                lp, rp = padder.pad(l, r)
                outs = self._keep(self.window_fn(lp[None], rp[None]))
                return tuple(padder.unpad(o[0]) for o in outs)

            self._jitted[key] = self._jit(fn, 2)
        return self._jitted[key](left, right)

    def _run_window_warm(self, left, right, prev_disp, overlap: int):
        """Warm window seeded from the previous window's device-resident
        signed disparity: seed = [prev_disp[-overlap:], then the last
        overlapping frame repeated for the new frames] — assembled inside
        the jitted graph so chaining never syncs to host."""
        t, h, w, _ = left.shape
        prev_len = prev_disp.shape[0]
        key = ("warm", t, h, w, prev_len, overlap)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)
            ov = overlap

            def fn(l, r, prev):
                tail = jnp.broadcast_to(prev[-1:], (t - ov, *prev.shape[1:]))
                fi = jnp.concatenate([prev[prev_len - ov :], tail]) if ov else tail
                lp, rp = padder.pad(l, r)
                (fip,) = padder.pad(fi.astype(jnp.float32))
                outs = self._keep(
                    self.warm_window_fn(lp[None], rp[None], fip[None])
                )
                return tuple(padder.unpad(o[0]) for o in outs)

            self._jitted[key] = self._jit(fn, 2, n_device_args=1)
        return self._jitted[key](left, right, prev_disp)

    def _run_window_cached(self, left, right, cached, n_ov: int,
                           keep_last: int):
        """Encoder-cached strict window: per-frame features for the
        first n_ov frames come from the previous window's device-resident
        cache; only the t - n_ov NEW frames run the encoders. The
        encoders are strictly per-frame (PPMStereo.encode_frames), so the
        stitched output is identical to the uncached driver while saving
        ~overlap/kernel of the encoder FLOPs per window — the reference
        recomputes them (ppmstereo.py:601-624). Returns the window
        outputs plus the feature cache (last keep_last frames) for the
        next window; all chaining stays on device."""
        t, h, w, _ = left.shape
        key = ("enccache", t, h, w, n_ov, keep_last)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)

            def encode_and_assemble(lp, rp, cfeats):
                nfeats = self.encode_window_fn(
                    lp[n_ov:][None], rp[n_ov:][None]
                )
                if cfeats is None:
                    return nfeats
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=1),
                    cfeats, nfeats,
                )

            def body(lp, rp, feats):
                outs = self._keep(
                    self.body_window_fn(lp[None], rp[None], feats)
                )
                cache = jax.tree_util.tree_map(
                    lambda x: x[:, t - keep_last:], feats
                )
                return tuple(padder.unpad(o[0]) for o in outs) + (cache,)

            if n_ov:
                def fn(l, r, cfeats):
                    lp, rp = padder.pad(l, r)
                    return body(lp, rp, encode_and_assemble(lp, rp, cfeats))

                self._jitted[key] = self._jit(fn, 2, n_device_args=1)
            else:
                def fn(l, r):
                    lp, rp = padder.pad(l, r)
                    return body(lp, rp, encode_and_assemble(lp, rp, None))

                self._jitted[key] = self._jit(fn, 2)
        if n_ov:
            return self._jitted[key](left, right, cached)
        return self._jitted[key](left, right)

    def _run_window_warm_cached(self, left, right, prev_disp, overlap: int,
                                cached, n_ov: int, keep_last: int):
        """Warm window with BOTH device chains: the warm disparity seed
        from the previous window (_run_window_warm) and the per-frame
        encoder-feature cache (_run_window_cached) — one dispatch, no
        host syncs."""
        t, h, w, _ = left.shape
        prev_len = prev_disp.shape[0]
        key = ("warmenccache", t, h, w, prev_len, overlap, n_ov, keep_last)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)
            ov = overlap

            def fn(l, r, prev, cfeats):
                tail = jnp.broadcast_to(prev[-1:], (t - ov, *prev.shape[1:]))
                fi = jnp.concatenate([prev[prev_len - ov :], tail]) if ov else tail
                lp, rp = padder.pad(l, r)
                (fip,) = padder.pad(fi.astype(jnp.float32))
                nfeats = self.encode_window_fn(
                    lp[n_ov:][None], rp[n_ov:][None]
                )
                feats = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=1),
                    cfeats, nfeats,
                )
                outs = self._keep(
                    self.warm_body_window_fn(
                        lp[None], rp[None], fip[None], feats
                    )
                )
                cache = jax.tree_util.tree_map(
                    lambda x: x[:, t - keep_last:], feats
                )
                return tuple(padder.unpad(o[0]) for o in outs) + (cache,)

            self._jitted[key] = self._jit(fn, 2, n_device_args=2)
        return self._jitted[key](left, right, prev_disp, cached)

    def _run_window_batch(self, lefts: jax.Array, rights: jax.Array):
        """lefts/rights: (B, T, H, W, 3). Returns a tuple of
        (B, T, H, W, 1) outputs (disparity [, uncertainty])."""
        bsz, t, h, w, _ = lefts.shape
        key = ("batch", bsz, t, h, w)
        if key not in self._jitted:
            padder = InputPadder(h, w, divis_by=self.divis_by)

            def fn(ls, rs):
                lp, rp = padder.pad(ls, rs)
                outs = self._keep(self.window_fn(lp, rp))
                return tuple(padder.unpad(o) for o in outs)

            self._jitted[key] = self._jit(fn, 2, batched=True)
        return self._jitted[key](lefts, rights)

    def __call__(self, stereo_video) -> dict[str, np.ndarray]:
        """stereo_video: (N, 2, H, W, 3) in [0, 255] (numpy or jax).

        Returns {"disparity": (N, H, W, 1)[, "uncertainties": like it]}
        as numpy, disparity as absolute values (reference :309-310);
        "uncertainties" present iff fetch_uncertainty.
        """
        video = np.asarray(stereo_video)
        num_ims = len(video)
        k = self.kernel_size
        stride = k if self.fast_mode else k // 2

        # upload the video ONCE and slice windows on device: overlapping
        # windows share stride frames, so per-window host->device uploads
        # move ~2x the data and serialize on tunnel latency
        dvideo = jnp.asarray(video)

        if k > num_ims:
            outs = self._run_window(dvideo[:, 0], dvideo[:, 1])
            return {
                nm: np.abs(np.asarray(o))
                for nm, o in zip(self.output_names, outs)
            }

        jobs = []  # (start, wlen, left_frames, right_frames) device slices
        for i in range(0, num_ims, stride):
            j = min(i + k, num_ims)
            wlen = j - i
            if not self.fast_mode and i > 0 and wlen < stride:
                continue  # reference skips tails shorter than a stride
            jobs.append((i, wlen, dvideo[i:j, 0], dvideo[i:j, 1]))

        pending = []  # (start, wlen, staged-output tuple), fetched lazily
        wire = self.wire_dtype

        def bounds(i: int, wlen: int) -> tuple[int, int]:
            return window_trim_bounds(i, wlen, k, stride, self.fast_mode)

        def stage(i, wlen, x):
            """Trim+cast on device IMMEDIATELY after the window's dispatch
            and start the device->host copy: the trim executes right
            after its window in the device queue (not behind every later
            window) and the copy crosses the ~15-25 MB/s tunnel while
            later windows compute. Trimming is pure slicing (only kept
            frames travel), so stitching stays bit-identical."""
            if self.align_windows:
                y = x  # alignment regresses on full windows on host
            else:
                lo, hi = bounds(i, wlen)
                y = x[lo : x.shape[0] - hi] if hi else x[lo:]
                if wire is not None:
                    y = y.astype(wire)
            try:
                y.copy_to_host_async()
            except Exception:  # noqa: BLE001 - best-effort prefetch only
                pass
            return y

        n_drained = 0

        def append_and_drain(entry):
            """Bound device-resident output buffers: past
            max_inflight_windows staged windows, materialize the oldest
            to host (blocks only on data already produced, so later
            windows keep computing) — long videos run in O(bound) output
            HBM instead of O(video length)."""
            nonlocal n_drained
            pending.append(entry)
            while len(pending) - n_drained > self.max_inflight_windows:
                i, wlen, outs = pending[n_drained]
                pending[n_drained] = (
                    i, wlen, tuple(np.asarray(o) for o in outs)
                )
                n_drained += 1

        if self.warm_window_fn is not None:
            # warm-start mode: each window seeded by the last, chained on
            # device — dispatches enqueue without host syncs and fetches
            # overlap later windows' compute. With encoder_cache, the
            # per-frame feature cache chains alongside the seed.
            prev_start, prev_disp = None, None
            cache, n_ov = None, 0
            for idx, (i, wlen, lw, rw) in enumerate(jobs):
                keep_last = (
                    max(0, i + wlen - jobs[idx + 1][0])
                    if self.encoder_cache and idx + 1 < len(jobs) else 0
                )
                if prev_disp is None:
                    if self.encoder_cache:
                        *outs, cache = self._run_window_cached(
                            lw, rw, None, 0, keep_last
                        )
                    else:
                        outs = self._run_window(lw, rw)
                else:
                    ov = max(0, min(prev_start + prev_disp.shape[0] - i, wlen))
                    if self.encoder_cache:
                        *outs, cache = self._run_window_warm_cached(
                            lw, rw, prev_disp, ov, cache, n_ov, keep_last
                        )
                    else:
                        outs = self._run_window_warm(lw, rw, prev_disp, ov)
                n_ov = keep_last
                prev_start, prev_disp = i, outs[0]
                append_and_drain(
                    (i, wlen, tuple(stage(i, wlen, o) for o in outs))
                )
            jobs = []

        elif self.encoder_cache:
            # strict windows with per-frame encoder outputs chained on
            # device: window j+1 reuses the features of the frames it
            # shares with window j (exact — see _run_window_cached)
            cache, n_ov = None, 0
            for idx, (i, wlen, lw, rw) in enumerate(jobs):
                keep_last = (
                    max(0, i + wlen - jobs[idx + 1][0])
                    if idx + 1 < len(jobs) else 0
                )
                *outs, cache = self._run_window_cached(
                    lw, rw, cache, n_ov, keep_last
                )
                n_ov = keep_last
                append_and_drain(
                    (i, wlen, tuple(stage(i, wlen, o) for o in outs))
                )
            jobs = []

        idx = 0
        while idx < len(jobs):
            group = [jobs[idx]]
            while (
                len(group) < self.batch_windows
                and idx + len(group) < len(jobs)
                and jobs[idx + len(group)][1] == group[0][1]
            ):
                group.append(jobs[idx + len(group)])
            idx += len(group)
            if len(group) == 1:
                i, wlen, lw, rw = group[0]
                outs = self._run_window(lw, rw)
                append_and_drain(
                    (i, wlen, tuple(stage(i, wlen, o) for o in outs))
                )
            else:
                ls = jnp.stack([g[2] for g in group])
                rs = jnp.stack([g[3] for g in group])
                bouts = self._run_window_batch(ls, rs)
                for gi, (i, wlen, _, _) in enumerate(group):
                    append_and_drain(
                        (i, wlen, tuple(stage(i, wlen, o[gi]) for o in bouts))
                    )

        parts = [[] for _ in self.output_names]
        prev_disp = None
        prev_start = None
        for i, wlen, outs in pending:
            if self.align_windows:
                # alignment regresses on full overlapping windows on host,
                # then trims here (staging left these windows untrimmed)
                outs = [np.asarray(o) for o in outs]
                disp = outs[0]
                if prev_disp is not None:
                    ov = prev_start + len(prev_disp) - i
                    if ov > 0:
                        a, b = scale_shift_align(prev_disp[-ov:], disp[:ov])
                        outs[0] = disp = a * disp + b
                prev_disp, prev_start = disp, i
                lo, hi = bounds(i, wlen)
                outs = [
                    (o[lo : len(o) - hi] if hi else o[lo:]) for o in outs
                ]
            for dst, o in zip(parts, outs):
                dst.append(o)

        def assemble(plist):
            # per-part upcast: no-op for parts already f32 (align path,
            # host-drained f32 wire), f16->f32 for narrow-wire parts
            out = np.concatenate(
                [np.asarray(p, dtype=np.float32) for p in plist]
            )
            return np.abs(out, out=out)  # in-place: no second 100+MB copy

        return {
            nm: assemble(plist)
            for nm, plist in zip(self.output_names, parts)
        }
