"""Instrumented end-to-end warm-start windowing at 720p/k20: manually
replays the predictor's warm schedule with block/fetch timestamps to
decompose device time vs tunnel wire time. Run on the TPU; one process.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.models.inference import SlidingWindowPredictor


def main():
    h, w, k = 720, 1280, 20
    stride = k // 2
    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=cfg, iters=20, test_mode=True)
    model_warm = PPMStereo(cfg=cfg, iters=10, test_mode=True)

    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (2 * k, 2, h, w, 3)).astype(np.uint8)

    from ppmstereo_tpu.ops.padding import InputPadder

    padder = InputPadder(h, w, divis_by=32)
    ph, pw = padder.padded_hw
    init_l = jnp.zeros((1, k, ph, pw, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_l, init_l)

    pred = SlidingWindowPredictor(
        lambda l, r: model.apply(params, l, r),
        kernel_size=k,
        warm_window_fn=lambda l, r, f: model_warm.apply(params, l, r, flow_init=f),
    )

    # warm-up: compile everything via the real driver
    t0 = time.perf_counter()
    out = pred(video)
    print(f"warmup pass: {time.perf_counter() - t0:.2f}s "
          f"({len(out['disparity'])} frames)", flush=True)

    # measured replay with per-phase blocking
    t_all = time.perf_counter()

    def mark(label, t0):
        print(f"  {label}: {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    dvideo = jnp.asarray(video)
    jax.block_until_ready(dvideo)
    mark("upload video (226 MB uint8)", t0)

    # the REAL warm schedule for 40 frames at k=20/stride=10:
    # windows i = 0, 10, 20, 30 (the i=30 window has wlen=10 == stride and
    # is kept per the reference's tail rule); trims (0,5),(5,5),(5,5),(5,0)
    from ppmstereo_tpu.models.inference import window_trim_bounds

    outs = []
    prev = None
    for i in (0, 10, 20, 30):
        j = min(i + k, len(video))
        lw, rw = dvideo[i:j, 0], dvideo[i:j, 1]
        t0 = time.perf_counter()
        if prev is None:
            d, u = pred._run_window(lw, rw)
        else:
            ov = max(0, min(outs[-1][0] + prev.shape[0] - i, j - i))
            d, u = pred._run_window_warm(lw, rw, prev, ov)
        jax.block_until_ready(d)
        mark(f"window@{i} t={j - i} {'cold' if prev is None else 'warm'}"
             " (blocked)", t0)
        prev = d
        outs.append((i, j - i, d, u))

    for i, wlen, d, u in outs:
        lo, hi = window_trim_bounds(i, wlen, k, stride)
        sl = slice(lo, wlen - hi if hi else wlen)
        t0 = time.perf_counter()
        a = np.asarray(d[sl])
        mark(f"fetch disp[{sl.start}:{sl.stop}] win@{i} "
             f"({a.nbytes / 1e6:.0f} MB)", t0)
        t0 = time.perf_counter()
        b = np.asarray(u[sl])
        mark(f"fetch unc[{sl.start}:{sl.stop}] win@{i} "
             f"({b.nbytes / 1e6:.0f} MB)", t0)

    total = time.perf_counter() - t_all
    print(f"replay total: {total:.2f}s -> {40 / total:.3f} fps", flush=True)

    # and once more through the real driver for the honest number
    t0 = time.perf_counter()
    out = pred(video)
    dt = time.perf_counter() - t0
    print(f"driver pass: {dt:.2f}s -> {len(out['disparity']) / dt:.3f} fps",
          flush=True)


if __name__ == "__main__":
    main()
