"""Round-5 block-policy sweep at the 720p play shapes (VERDICT r4 item 1b).

The 1/8-scale play shape runs at ~65% of bf16 peak vs 78-82% for the
same kernel at other shapes (BENCH_NOTES "Post-outage queue"); the r4
short-shape sweep showed the default (2048, 512) optimal THERE, but the
1/8 720p shape (b20, q14720, kv73600) was never swept. This sweeps
(block_q, block_k) grids at SHAPE=18 (1/8) or SHAPE=14 (1/4, b=4 chunk
of the 10-frame half-batch to bound runtime; scales linearly).

Protocol: one jit per config, N iters amortized in a fori_loop (tunnel
dispatch ~30 ms), scalar-fetch sync, same-session A/B only.
"""
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import (
    _block_policy,
    _play_attention_pallas,
)

SHAPE = os.environ.get("SHAPE", "18")
if SHAPE == "18":
    B, LQ, LK, D = 20, 14720, 73600, 128   # 720p 1/8: 92x160, k=5
elif SHAPE == "14":
    B, LQ, LK, D = 4, 58880, 294400, 128   # 720p 1/4: 184x320, k=5 (b4 slice)
else:
    raise SystemExit(f"unknown SHAPE {SHAPE}")
N = int(os.environ.get("N", "4"))
SCALE = D**-0.5 * math.log(2 * D, 12000)

default = _block_policy(LQ, LK)
print(f"shape {SHAPE}: b{B} q{LQ} kv{LK} d{D}; default blocks {default}",
      flush=True)

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(
    rng.standard_normal(s).astype(np.float32)
).astype(jnp.bfloat16)
q, k, v = bf(B, LQ, D), bf(B, LK, D), bf(B, LK, D)

flops = 4 * B * LQ * LK * D
peak = 197e12

# grid: key blocks that divide kv (no tail mask — masking measured ~2x
# slower) x query blocks up to the VMEM-comfortable range
bks = [bk for bk in (256, 320, 460, 512, 640, 736, 800, 920, 1024)
       if LK % bk == 0]
bqs = [512, 1024, 2048, 4096]
grid = [(bq, bk) for bq in bqs for bk in bks]
grid = [default] + [g for g in grid if g != default]

results = {}
for bq, bk in grid:
    def run(q, k, v, bq=bq, bk=bk):
        def body(i, acc):
            eps = (acc * 1e-30).astype(q.dtype)
            out = _play_attention_pallas(
                q + eps, k, v, SCALE, block_q=bq, block_k=bk
            )
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    try:
        jfn = jax.jit(run)
        t0 = time.perf_counter()
        float(jfn(q, k, v))  # compile + warm
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(q, k, v))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / N * 1e3
        pct = flops / (ms * 1e-3) / peak * 100
        results[(bq, bk)] = ms
        print(f"  bq={bq:5d} bk={bk:4d}: {ms:7.1f} ms/iter "
              f"{pct:5.1f}% peak (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 - sweep survives compile flakes
        print(f"  bq={bq:5d} bk={bk:4d}: FAILED "
              f"{type(e).__name__}: {str(e)[:100]}", flush=True)

if results:
    best = min(results, key=results.get)
    ms = results[best]
    print(f"BEST bq={best[0]} bk={best[1]}: {ms:.1f} ms/iter "
          f"({flops/(ms*1e-3)/peak*100:.1f}% peak) vs default "
          f"{results.get(default, float('nan')):.1f} ms", flush=True)
