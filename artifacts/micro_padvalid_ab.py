"""A/B: explicit jnp.pad+VALID Conv lowering (round-4 Shardy fix,
nn/common.py) vs the implicit-padding lowering, on the short-config
device window. Run ON TPU:  python artifacts/micro_padvalid_ab.py

Expectation: identical numerics and ~identical time (XLA folds the pad
into the convolution); this script is the on-chip proof.
"""
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

CHILD = r"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

h, w, t, iters = 320, 512, 10, 10
cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
model = PPMStereo(cfg=cfg, iters=iters, test_mode=True)
rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (1, t, h, w, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, t, h, w, 3)).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
fn = jax.jit(model.apply)
sync = lambda o: float(jnp.mean(o[0]))  # axon block_until_ready doesn't wait
t0 = time.time()
out = fn(params, left, right)
sync(out)
print(f"  first call (compile) {time.time()-t0:.1f}s", flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(params, left, right)
    sync(out)
    times.append(time.perf_counter() - t0)
d = np.asarray(out[0])
print(f"  window: {min(times):.4f}s (all {['%.3f' % x for x in times]})  "
      f"disp mean {float(np.abs(d).mean()):.6f}", flush=True)
"""

import time

for name, env in [("implicit(old)", {"PPM_CONV_IMPLICIT_PAD": "1"}),
                  ("padvalid(new)", {})]:
    print(f"== {name}", flush=True)
    e = dict(os.environ)
    e.pop("PPM_CONV_IMPLICIT_PAD", None)
    e.update(env)
    # APPEND to PYTHONPATH: the session's PYTHONPATH carries
    # /root/.axon_site (the axon backend package) — replacing it breaks
    # TPU registration in the child
    e["PYTHONPATH"] = "/root/repo:" + e.get("PYTHONPATH", "")
    for attempt in range(4):
        r = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode == 0:
            break
        # tunnel grant can lag a previous process's exit — wait and retry
        tail = (r.stderr or "").strip().splitlines()
        print(f"  attempt {attempt+1} failed: "
              f"{tail[-1][:120] if tail else '?'}", flush=True)
        time.sleep(45)
    else:
        sys.exit(1)
