"""Isolated SKSepConvGRU3D cost at the short 1/4 shape vs the 10.5
ms/iter measured in-model (artifacts/profile_iter.py).

If the isolated module is markedly cheaper, the in-model overhead is
layout transitions between the width/height/time passes and a fused
Pallas gate pass is a live lever; if it matches, 10.5 ms is intrinsic
to the conv shapes and the short-config device floor stays ~0.57 s.

Run ON TPU: PYTHONPATH=/root/repo:$PYTHONPATH python artifacts/micro_gru_inmodel_gap.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.nn.gru import SKSepConvGRU3D

B, T, H, W = 1, 10, 80, 128
HID, XDIM = 128, 384
N = 16  # chained calls per jit (amortize ~30 ms dispatch)

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(
    rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
h0 = bf(B, T, H, W, HID)
x0 = bf(B, T, H, W, XDIM)

gru = SKSepConvGRU3D(hidden_dim=HID, dtype=jnp.bfloat16)
params = gru.init(jax.random.PRNGKey(0), h0, x0)


def chain(h, x):
    def body(_, cur):
        return gru.apply(params, cur, x)

    return jax.lax.fori_loop(0, N, body, h)


fn = jax.jit(chain)
t0 = time.time()
print(f"first {float(jnp.mean(fn(h0, x0))):.5f} "
      f"({time.time()-t0:.1f}s compile)", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jnp.mean(fn(h0, x0)))  # scalar fetch: the only real sync
    ts.append((time.perf_counter() - t0) / N)
print(f"isolated SKSepConvGRU3D: {min(ts)*1e3:.2f} ms/iter "
      f"(in-model measured 10.5; all {[f'{t*1e3:.2f}' for t in ts]})",
      flush=True)
