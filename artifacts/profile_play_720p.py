"""Play-step cost split at the FULL-config 1/4 shape (720p, k20).

The one-hot gather einsum that materializes the picked memory bank costs
b*t*k*hw*(2c+c) MACs per iteration — ~9e13 FLOPs at 720p/k20, the same
order as the attention itself — and writes a ~4.5 GB bank. This measures,
at b=1 t=20 184x320 c=128 k=5 (the padded 720p 1/4 grid):

  1. the one-hot gather einsum alone (key_aug + value)
  2. the Pallas flash attention alone on a pre-gathered bank
  3. the full _play (gather + modulation + attention), chunked as in prod
  4. a leading-axis take gather (loser at short shapes; FLOP-free here)

If (1) is a significant share of (3), a fused Pallas kernel that streams
picked frames' K/V directly (scalar-prefetch block indexing) removes it.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.kernels.play_attention import play_attention

B, T, H, W, C, K = 1, 20, 184, 320, 128, 5
N = int(os.environ.get("N", "4"))
import math
SCALE = C**-0.5 * math.log(2 * C, 12000)

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)

query_pe = bf(B, T, H, W, C)
key_aug = bf(B, T, H, W, 2 * C)
value = bf(B, T, H, W, C)
idx = jnp.asarray(rng.integers(0, T, (B, T, K)).astype(np.int32))
score_norm = jnp.ones((B, T, K), jnp.float32)


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).mean())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(*args)).mean())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)/N*1e3:9.1f} ms/iter", flush=True)
    return min(ts) / N


def amortize(fn):
    def run(*args):
        def body(i, acc):
            eps = acc * 1e-30
            out = fn(*[a + eps.astype(a.dtype) for a in args])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    return run


# 1. one-hot gather alone (as in PPMUpdateLoop._play, both tensors)
def onehot_gather(key_aug, value):
    onehot = jax.nn.one_hot(idx, T, dtype=key_aug.dtype)

    def gather(x):
        return jnp.einsum(
            "brkt,bthwc->brkhwc", onehot, x,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    return gather(key_aug)[..., 0].sum() + gather(value)[..., 0].sum()


timeit("one-hot gather einsum (key_aug+value)", amortize(onehot_gather), key_aug, value)


# 2. attention alone on a pre-gathered contiguous bank (one target chunk
# of R frames at a time, matching prod chunking)
R = 10  # rows per chunk s.t. bank fits
q_tok = bf(B * R, H * W, C)
k_tok = bf(B * R, K * H * W, C)
v_tok = bf(B * R, K * H * W, C)


def attn_only(q, k, v):
    return play_attention(q, k, v, SCALE)[..., 0].sum()


t_attn = timeit(f"pallas attention alone (R={R} chunk)", amortize(attn_only), q_tok, k_tok, v_tok)
print(f"{'':44s} -> x{T // R} chunks = {t_attn * (T // R) * 1e3:9.1f} ms/iter for all targets", flush=True)


# 3. full production _play
from ppmstereo_tpu.models.ppm_stereo import PPMUpdateLoop, PPMStereoConfig

cfg = PPMStereoConfig(mixed_precision=True)
loop = PPMUpdateLoop(cfg=cfg, iters=1, interp_scale=1, collect_preds=False)
params = {"params": {}}  # _play uses no params


def full_play(q, ka, v):
    return loop.apply(
        params, q, ka, v, idx, score_norm, method=PPMUpdateLoop._play
    )[..., 0].sum()


timeit("full _play (gather+mod+attention, chunked)", amortize(full_play), query_pe, key_aug, value)


# 4. leading-axis take gather (vmap over batch): x[(b,)t,h,w,c][idx_r]
def take_gather(key_aug, value):
    def per_b(x, ib):
        return x[ib]  # (T,K,H,W,C') via leading-axis take

    g1 = jax.vmap(per_b)(key_aug, idx)
    g2 = jax.vmap(per_b)(value, idx)
    return g1[..., 0].sum() + g2[..., 0].sum()


timeit("leading-axis take gather (key_aug+value)", amortize(take_gather), key_aug, value)
