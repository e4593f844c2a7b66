"""Scaling benchmark: frames/s vs mesh size for window-parallel inference.

The north-star target is >=80% scaling efficiency at 2+ hosts
(BASELINE.json). This environment exposes ONE real TPU chip, so this
harness is the measurement tool for multi-chip/multi-host slices (run it
under `jax.distributed` on a pod); on a single chip it degenerates to the
sequential number.

Prints one JSON line per mesh size:
  {"devices": N, "frames_per_s": X, "scaling_efficiency": X/N/X_1}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
    from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh
    from ppmstereo_tpu.parallel.streaming import ParallelWindowPredictor

    h, w, t_window, iters = 320, 512, 10, 10
    n_frames = 60
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (n_frames, 2, h, w, 3)).astype(np.uint8)

    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=cfg, iters=iters, test_mode=True)
    init = jnp.zeros((1, t_window, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init, init)

    def window_fn(left, right):
        return model.apply(params, left, right)

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    base = None
    for nd in sizes:
        mesh = make_mesh(MeshSpec(data=nd), devices=jax.devices()[:nd])
        pred = ParallelWindowPredictor(window_fn, mesh, kernel_size=t_window)
        _ = pred(video[: t_window * 2])  # warm
        t0 = time.perf_counter()
        out = pred(video)
        dt = time.perf_counter() - t0
        fps = len(out["disparity"]) / dt
        base = base or fps
        print(
            json.dumps(
                {
                    "devices": nd,
                    "frames_per_s": round(fps, 3),
                    "scaling_efficiency": round(fps / (nd * base), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
