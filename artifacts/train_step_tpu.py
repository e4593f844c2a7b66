"""Time one full PPMStereo training step on the TPU.

Reference recipe shape: batch B (default 1), T=5, 320x512 crops,
train_iters=10, cnet on, per-iteration remat, bf16 mixed precision
(/root/reference/train.py:367-418). Re-measure after kernel changes —
notably the Pallas flash backward default (PPM_FLASH_BWD=1).

Env knobs: TRAIN_B (batch), TRAIN_ITERS, PPM_FLASH_BWD (read by the
kernel module), REPS.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    b = int(os.environ.get("TRAIN_B", "1"))
    iters = int(os.environ.get("TRAIN_ITERS", "10"))
    reps = int(os.environ.get("REPS", "3"))
    t, h, w = 5, 320, 512

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
    from ppmstereo_tpu.train.state import create_train_state
    from ppmstereo_tpu.train.step import make_train_step

    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True, remat=True)
    model = PPMStereo(cfg=cfg, iters=iters, test_mode=False)

    rng = np.random.default_rng(0)
    batch = {
        "left": jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)), jnp.float32),
        "right": jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)), jnp.float32),
        # positive disparities per the reference convention (the model
        # negates to flow-x internally); values only affect the printed
        # loss, not step timing
        "disparity": jnp.asarray(rng.uniform(0, 60, (b, t, h, w, 1)), jnp.float32),
        "valid": jnp.ones((b, t, h, w), jnp.float32),
    }

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["left"], batch["right"])
    state = create_train_state(model, params, num_steps=1000)
    print(f"init done {time.perf_counter() - t0:.1f}s", flush=True)

    step = jax.jit(make_train_step(model), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    print(
        f"first step (compile+run) {time.perf_counter() - t0:.1f}s "
        f"loss={float(metrics['loss']):.4f}",
        flush=True,
    )

    for i in range(reps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        print(
            f"rep{i}: {dt:.2f} s/step ({dt / b:.2f} s/sample) "
            f"loss={float(metrics['loss']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
