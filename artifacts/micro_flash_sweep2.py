"""Second flash-kernel block sweep after the lane-tiled m/l layout landed.

78% of bf16 peak at 720p with (2048, 512); probe larger q blocks and
non-power-of-2 k blocks (any multiple of 128 tiles cleanly) for the
remaining ~20%.
"""
import os, time, math
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import _play_attention_pallas

R, Lq, Lk, D = 10, 58880, 294400, 128
SCALE = D**-0.5 * math.log(2 * D, 12000)
FLOPS = 2 * 2 * R * Lq * Lk * D
N = 4
rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = bf(R, Lq, D), bf(R, Lk, D), bf(R, Lk, D)

results = []
for bq, bk in ((2048, 512), (4096, 512), (2048, 384), (2048, 640),
               (2048, 768), (4096, 384), (3072, 512), (4096, 256)):
    def run(q, k, v, bq=bq, bk=bk):
        def body(i, acc):
            eps = (acc * 1e-30).astype(q.dtype)
            out = _play_attention_pallas(q + eps, k, v, SCALE, block_q=bq, block_k=bk)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    fn = jax.jit(run)
    try:
        float(fn(q, k, v))
    except Exception as e:
        print(f"bq={bq:5d} bk={bk:4d}  FAILED: {str(e)[:90]}", flush=True)
        continue
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(fn(q, k, v)); ts.append(time.perf_counter() - t0)
    t = min(ts) / N
    print(f"bq={bq:5d} bk={bk:4d}  {t*1e3:7.1f} ms  {FLOPS/t/197e12*100:5.1f}% peak", flush=True)
    results.append((t, bq, bk))

results.sort()
print("best:", results[0], flush=True)
