"""Queue item 1: 720p 1/8 play shape with DEFAULT (alignment-aware) blocks.

Shape (b=20, lq=14720, lk=73600, d=128) = 720p 1/8 grid (92x160), k=5
memory frames, chunked so all 20 target frames form the batch. Before the
alignment-aware _pick_block_k landed, the default 512 block paid the
in-kernel key-padding mask: 146 ms. The 640-aligned block should land
~75 ms. N amortized inside one jit to hide ~30 ms tunnel dispatch.
"""
import os, time, math
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import play_attention, _block_policy

B, LQ, LK, D = 20, 14720, 73600, 128
N = int(os.environ.get("N", "6"))
SCALE = D**-0.5 * math.log(2 * D, 12000)

print("default blocks:", _block_policy(LQ, LK), flush=True)

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = bf(B, LQ, D), bf(B, LK, D), bf(B, LK, D)


def run(q, k, v):
    def body(i, acc):
        eps = (acc * 1e-30).astype(q.dtype)
        out = play_attention(q + eps, k, v, SCALE)
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

    return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))


jfn = jax.jit(run)
float(jfn(q, k, v))  # compile + warm
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jfn(q, k, v))
    ts.append(time.perf_counter() - t0)
ms = min(ts) / N * 1e3
flops = 4 * B * LQ * LK * D
peak = 197e12  # v5e bf16
print(f"play 1/8 (b{B} q{LQ} kv{LK}): {ms:.1f} ms/iter  "
      f"{flops/(ms*1e-3)/peak*100:.1f}% of bf16 peak", flush=True)
