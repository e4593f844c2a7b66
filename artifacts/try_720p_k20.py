"""Feasibility: one 720p kernel=20 iters=20 window on a single v5e chip
(BASELINE config #3's exact operating point). Times the window forward
and reports success or the OOM error."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.ops.padding import InputPadder

h, w, t, iters = 720, 1280, 20, 20
cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
model = PPMStereo(cfg=cfg, iters=iters, test_mode=True)

padder = InputPadder(h, w, divis_by=32)
ph, pw = padder.padded_hw
print(f"padded {ph}x{pw}, T={t}, iters={iters}", flush=True)

init_l = jnp.zeros((1, t, ph, pw, 3), jnp.float32)
t0 = time.perf_counter()
params = jax.jit(model.init)(jax.random.PRNGKey(0), init_l, init_l)
jax.tree_util.tree_map(lambda x: x.block_until_ready(), params)
print(f"init done {time.perf_counter()-t0:.1f}s", flush=True)

fwd = jax.jit(model.apply)
rng = np.random.default_rng(0)
left = jnp.asarray(rng.integers(0, 255, (1, t, ph, pw, 3)).astype(np.uint8))
right = jnp.asarray(rng.integers(0, 255, (1, t, ph, pw, 3)).astype(np.uint8))

t0 = time.perf_counter()
disp, unc = fwd(params, left.astype(jnp.float32), right.astype(jnp.float32))
v = float(jnp.asarray(disp).mean())  # force real execution over the tunnel
print(f"first call (compile+run) {time.perf_counter()-t0:.1f}s mean={v:.4f}",
      flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    disp, unc = fwd(params, left.astype(jnp.float32), right.astype(jnp.float32))
    v = float(jnp.asarray(disp).mean())
    dt = time.perf_counter() - t0
    print(f"rep{rep}: {dt:.2f}s -> {t/dt:.3f} frames/s device-side", flush=True)
