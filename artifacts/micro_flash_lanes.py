"""A/B: m/l softmax state as (block_q, 128) lane tiles vs (block_q, 1).

JAX's reference TPU flash kernel measures 63.7% peak at the 720p play
shape where ours gets 43%; its visible structural difference is lane-tiled
m/l scratch + jnp.tile broadcasts. This prototypes that layout in our
kernel shape-for-shape.
"""
import os, time, math, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634
LANES = 128


def _kernel_lanes(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, kv_len):
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * (scale * _LOG2E)

    blk_k = k.shape[0]
    rem = kv_len % blk_k
    if rem:
        s = jax.lax.cond(
            k_idx == num_k - 1,
            lambda s: jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < rem, s, _NEG_INF
            ),
            lambda s: s,
            s,
        )

    m_prev = m_ref[:]          # (bq, 128)
    l_prev = l_ref[:]          # (bq, 128)
    m_cur = jnp.max(s, axis=1)[:, None]  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)   # (bq, 128)

    reps = s.shape[1] // LANES
    p = jnp.exp2(s - jnp.tile(m_new, (1, reps)))
    alpha = jnp.exp2(m_prev - m_new)     # (bq, 128)
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def attn_lanes(q, k, v, scale, block_q, block_k):
    b, lq, d = q.shape
    lk = k.shape[1]
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = q.shape[1], k.shape[1]
    grid = (b, lq_p // block_q, lk_p // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel_lanes, scale=scale, kv_len=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q, k, v)
    return out[:, :lq]


if __name__ == "__main__":
    from ppmstereo_tpu.kernels.play_attention import _play_attention_pallas

    R, Lq, Lk, D = 10, 58880, 294400, 128
    SCALE = D**-0.5 * math.log(2 * D, 12000)
    FLOPS = 2 * 2 * R * Lq * Lk * D
    N = 4
    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = bf(R, Lq, D), bf(R, Lk, D), bf(R, Lk, D)

    # correctness vs current kernel at a small shape
    qs, ks, vs = bf(2, 1024, D), bf(2, 2000, D), bf(2, 2000, D)
    ref = _play_attention_pallas(qs, ks, vs, SCALE, block_q=512, block_k=512)
    got = attn_lanes(qs, ks, vs, SCALE, 512, 512)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print("max abs err vs current kernel:", err, flush=True)

    def bench(f, label, **kw):
        def run(q, k, v):
            def body(i, acc):
                eps = (acc * 1e-30).astype(q.dtype)
                out = f(q + eps, k, v, SCALE, **kw)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        fn = jax.jit(run)
        float(fn(q, k, v))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(fn(q, k, v)); ts.append(time.perf_counter() - t0)
        t = min(ts) / N
        print(f"{label}: {t*1e3:.1f} ms  {FLOPS/t/197e12*100:.1f}% peak", flush=True)

    for bq, bk in ((1024, 1024), (512, 1024), (1024, 512), (512, 512), (2048, 1024)):
        try:
            bench(attn_lanes, f"lanes bq={bq} bk={bk}", block_q=bq, block_k=bk)
        except Exception as e:
            print(f"lanes bq={bq} bk={bk} FAILED: {str(e)[:100]}", flush=True)
    bench(_play_attention_pallas, "current (bq=1024 bk=1024)", block_q=1024, block_k=1024)
