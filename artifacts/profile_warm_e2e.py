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

    outs = []
    t0 = time.perf_counter()
    d0, u0 = pred._run_window(dvideo[0:20, 0], dvideo[0:20, 1])
    jax.block_until_ready(d0)
    mark("window0 cold (blocked)", t0)
    outs.append((0, d0, u0))

    t0 = time.perf_counter()
    d1, u1 = pred._run_window_warm(dvideo[10:30, 0], dvideo[10:30, 1], d0, 10)
    jax.block_until_ready(d1)
    mark("window1 warm (blocked)", t0)
    outs.append((10, d1, u1))

    t0 = time.perf_counter()
    d2, u2 = pred._run_window_warm(dvideo[20:40, 0], dvideo[20:40, 1], d1, 10)
    jax.block_until_ready(d2)
    mark("window2 warm (blocked)", t0)
    outs.append((20, d2, u2))

    trims = [(0, 15), (5, 15), (5, 20)]
    for (i, d, u), (lo, hi) in zip(outs, trims):
        t0 = time.perf_counter()
        a = np.asarray(d[lo:hi])
        mark(f"fetch disp[{lo}:{hi}] win@{i} ({a.nbytes / 1e6:.0f} MB)", t0)
        t0 = time.perf_counter()
        b = np.asarray(u[lo:hi])
        mark(f"fetch unc[{lo}:{hi}] win@{i} ({b.nbytes / 1e6:.0f} MB)", t0)

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
