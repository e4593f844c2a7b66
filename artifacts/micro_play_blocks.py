"""Flash-attention block-size sweep at the 720p 1/4-scale play shape.

At 720p/k20 the play attention is 26 s of the 36.45 s window (70% of
bf16 peak with the 1024/1024 blocks tuned on the SHORT config). Sweep
(block_q, block_k) at the production chunk shape (R=10 targets,
Lq=58880, Lk=294400, d=128) for a better point.
"""
import os, time, itertools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import math
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import _play_attention_pallas

R, HW, K, D = 10, 184 * 320, 5, 128
SCALE = D**-0.5 * math.log(2 * D, 12000)
FLOPS = 2 * 2 * R * HW * (K * HW) * D  # qk + av

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q = bf(R, HW, D)
k = bf(R, K * HW, D)
v = bf(R, K * HW, D)

results = []
for bq, bk in itertools.product((512, 1024, 2048), (1024, 2048, 4096)):
    try:
        fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: _play_attention_pallas(
            q, k, v, SCALE, block_q=bq, block_k=bk))
        out = fn(q, k, v)
        float(out[..., 0].mean())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(q, k, v)[..., 0].mean())
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        pk = FLOPS / t / 197e12 * 100
        print(f"bq={bq:5d} bk={bk:5d}  {t*1e3:8.1f} ms  {pk:5.1f}% peak", flush=True)
        results.append((t, bq, bk))
    except Exception as e:
        print(f"bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:120]}", flush=True)

results.sort()
print("best:", results[0], flush=True)
