"""Training-path attention backward A/B at the train crop shape.

Candidates:
  1. current: custom VJP (Pallas flash fwd + chunked XLA recompute bwd)
  2. jax.experimental.pallas.ops.tpu.flash_attention fwd+bwd pair
  3. plain XLA attention fwd+bwd (autodiff through _play_attention_xla)

Shape: b=5 rows (T=5 targets), Lq=10240 (320x512 @ 1/4), Lk=5*10240,
d=128 — the reference training recipe's per-sample shape.
"""
import os, time, math
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import (
    _play_attention_tpu, _play_attention_tpu_flashbwd, _play_attention_xla,
)

R, Lq, Lk, D = 5, 10240, 51200, 128
SCALE = D**-0.5 * math.log(2 * D, 12000)
# fwd 2 matmuls + bwd 4 matmuls (dv, dp, dq, dk) + fwd recompute
FWD_FLOPS = 2 * 2 * R * Lq * Lk * D
BWD_FLOPS = 2 * 5 * R * Lq * Lk * D
N = int(os.environ.get("N", "6"))

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = bf(R, Lq, D), bf(R, Lk, D), bf(R, Lk, D)


def bench(label, loss_fn, flops):
    grad = jax.grad(loss_fn, argnums=(0, 1, 2))
    def run(q, k, v):
        def body(i, acc):
            eps = (acc * 1e-30).astype(q.dtype)
            dq, dk, dv = grad(q + eps, k, v)
            return acc + (jnp.sum(dq.astype(jnp.float32))
                          + jnp.sum(dk.astype(jnp.float32))
                          + jnp.sum(dv.astype(jnp.float32))) * 1e-30
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    fn = jax.jit(run)
    try:
        float(fn(q, k, v))
    except Exception as e:
        print(f"{label:34s} FAILED: {str(e)[:90]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(fn(q, k, v)); ts.append(time.perf_counter() - t0)
    t = min(ts) / N
    print(f"{label:34s} {t*1e3:8.2f} ms fwd+bwd  {flops/t/197e12*100:5.1f}% peak", flush=True)


# 1. current custom VJP
bench("custom VJP (flash fwd, XLA bwd)",
      lambda q, k, v: jnp.sum(_play_attention_tpu(q, k, v, SCALE).astype(jnp.float32)),
      FWD_FLOPS + BWD_FLOPS)

# 1b. our flash bwd kernels (dq + dkv, PPM_FLASH_BWD path)
bench("flash bwd (Pallas dq+dkv)",
      lambda q, k, v: jnp.sum(_play_attention_tpu_flashbwd(q, k, v, SCALE).astype(jnp.float32)),
      FWD_FLOPS + BWD_FLOPS)

# 2. jax flash fwd+bwd
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes
bs = BlockSizes(
    block_q=512, block_k_major=512, block_k=512, block_b=1,
    block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512, block_q_dkv=512,
    block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
)
def jax_flash_loss(q, k, v):
    out = flash_attention(q[:, None], k[:, None], v[:, None],
                          causal=False, sm_scale=SCALE, block_sizes=bs)
    return jnp.sum(out.astype(jnp.float32))
bench("jax flash fwd+bwd (512 blocks)", jax_flash_loss, FWD_FLOPS + BWD_FLOPS)

# 3. plain XLA
bench("plain XLA fwd+bwd",
      lambda q, k, v: jnp.sum(_play_attention_xla(q, k, v, SCALE).astype(jnp.float32)),
      FWD_FLOPS + BWD_FLOPS)
