"""Flash-attention block sweep at the SHORT-config 1/4-scale play shape.

bench short (320x512, k10, i10) runs its 1/4-loop play attention at
(R=10, Lq=80*128=10240, Lk=5*10240=51200, d=128) — measured ~65% of
bf16 peak with the default (2048, 512) blocks vs 78-82% at the 720p
shape. Sweep (block_q, block_k) with N kernel calls chained inside ONE
jit (per-dispatch tunnel overhead is ~30 ms, same order as the kernel).
"""
import os, time, itertools, math
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import _play_attention_pallas

R, HW, K, D = 10, 80 * 128, 5, 128
SCALE = D**-0.5 * math.log(2 * D, 12000)
FLOPS = 2 * 2 * R * HW * (K * HW) * D
N = 8  # kernel calls per jit

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(
    rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q = bf(R, HW, D)
k = bf(R, K * HW, D)
v = bf(R, K * HW, D)

results = []
for bq, bk in itertools.product(
    (512, 1024, 2048), (512, 640, 1024, 1280, 2560)
):
    try:
        def chain(qq, k, v, bq=bq, bk=bk):
            def body(_, cur):
                return _play_attention_pallas(
                    cur, k, v, SCALE, block_q=bq, block_k=bk)
            return jax.lax.fori_loop(0, N, body, qq)
        fn = jax.jit(chain)
        # the axon tunnel's block_until_ready does not wait — force a
        # scalar device->host fetch to synchronize
        float(fn(q, k, v)[0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(q, k, v)[0, 0, 0])
            ts.append((time.perf_counter() - t0) / N)
        t = min(ts)
        pk = FLOPS / t / 197e12 * 100
        print(f"bq={bq:5d} bk={bk:5d}  {t*1e3:8.2f} ms/call  {pk:5.1f}% peak",
              flush=True)
        results.append((t, bq, bk))
    except Exception as e:
        print(f"bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:110]}", flush=True)

results.sort()
print("best:", results[0], flush=True)
