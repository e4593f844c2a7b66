"""Device-side A/B: cold window (i20, full cascade) vs warm window (i10,
1/4-loop only) at the 720p/k20 protocol. Run on the TPU; one process.

Prints per-call wall seconds with block_until_ready so tunnel upload and
stitch overheads are excluded — isolates the model graphs themselves.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.ops.padding import InputPadder


def main():
    h, w, t = 720, 1280, 20
    padder = InputPadder(h, w, divis_by=32)
    ph, pw = padder.padded_hw

    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    cold_model = PPMStereo(cfg=cfg, iters=20, test_mode=True)
    warm_model = PPMStereo(cfg=cfg, iters=10, test_mode=True)

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (1, t, ph, pw, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, t, ph, pw, 3)).astype(np.float32))
    fi = jnp.asarray(rng.uniform(-60, 0, (1, t, ph, pw, 1)).astype(np.float32))

    params = jax.jit(cold_model.init)(jax.random.PRNGKey(0), left, right)

    cold = jax.jit(lambda l, r: cold_model.apply(params, l, r))
    warm = jax.jit(lambda l, r, f: warm_model.apply(params, l, r, flow_init=f))

    # compile
    for name, call in [("cold", lambda: cold(left, right)),
                       ("warm", lambda: warm(left, right, fi))]:
        t0 = time.perf_counter()
        jax.block_until_ready(call())
        print(f"{name} compile+run: {time.perf_counter() - t0:.2f}s", flush=True)

    # interleaved timed runs
    for rep in range(2):
        for name, call in [("cold", lambda: cold(left, right)),
                           ("warm", lambda: warm(left, right, fi))]:
            t0 = time.perf_counter()
            jax.block_until_ready(call())
            print(f"rep{rep} {name}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
