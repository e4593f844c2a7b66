"""On-chip timing of the ring-hop flash kernel (TPU_QUEUE item 3).

flash_attend_carry is the Pallas kernel each ring hop runs
(parallel/ring_attention.py): one flash pass over the LOCAL K/V shard
that merges into the carried online-softmax state (o, m, l). This
times it at the 720p/k20 ring shapes for a space=4 mesh —
q 14720 rows/shard (58880 px / 4), kv 73600 (top-5 x 14720) — and
compares %-of-peak against the batch kernel (play_attention) at the
identical FLOP count, answering whether hop throughput matches batch
throughput (the ring scaling model assumes it does).

Run ON TPU: PYTHONPATH=/root/repo python artifacts/micro_flash_carry_720p.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import (
    _LANES, _NEG_INF, flash_attend_carry, play_attention,
)

B, LQ, LK, D = 20, 14720, 73600, 128
SCALE = 1.0 / np.sqrt(D)
PEAK_TFLOPS = 197.0  # v5e bf16

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(
    rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = bf(B, LQ, D), bf(B, LK, D), bf(B, LK, D)
o0 = jnp.zeros((B, LQ, D), jnp.float32)
m0 = jnp.full((B, LQ, _LANES), _NEG_INF, jnp.float32)
l0 = jnp.zeros((B, LQ, _LANES), jnp.float32)

flops = B * 4 * LQ * LK * D


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    first = float(jnp.mean(out[0] if isinstance(out, (tuple, list)) else out))
    print(f"{name}: compile {time.time()-t0:.0f}s (mean {first:.5f})",
          flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.mean(out[0] if isinstance(out, (tuple, list)) else out))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: {best*1e3:.1f} ms = {flops/best/1e12:.1f} TFLOP/s "
          f"({100*flops/best/1e12/PEAK_TFLOPS:.0f}% of bf16 peak; "
          f"all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
    return best


t_carry = timeit("carry hop (cold state)",
                 lambda a, b_, c, o, m, l: flash_attend_carry(
                     a, b_, c, o, m, l, SCALE), q, k, v, o0, m0, l0)
# a mid-ring hop merges into a non-trivial carry — same compute, but
# check the merge path costs nothing extra
o1, m1, l1 = jax.jit(
    lambda a, b_, c, o, m, l: flash_attend_carry(a, b_, c, o, m, l, SCALE)
)(q, k, v, o0, m0, l0)
t_mid = timeit("carry hop (warm state)",
               lambda a, b_, c, o, m, l: flash_attend_carry(
                   a, b_, c, o, m, l, SCALE), q, k, v, o1, m1, l1)
t_batch = timeit("batch kernel (same shape)",
                 lambda a, b_, c: play_attention(a, b_, c, SCALE), q, k, v)
print(f"hop/batch ratio: {t_carry/t_batch:.2f}x (cold) "
      f"{t_mid/t_batch:.2f}x (warm)", flush=True)
