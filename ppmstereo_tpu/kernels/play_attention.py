"""The PPM "play" attention: q over the picked-memory key/value bank.

TPU-native replacement for the reference's flash_attn_func call
(/root/reference/models/core/ppmstereo.py:550): single-head, non-causal,
custom softmax scale, bf16 inputs, f32 softmax.

Two paths:
  * `_play_attention_pallas`: hand-written Pallas flash-attention kernel
    (online softmax over key blocks; logits never hit HBM). Used on TPU
    when shapes meet the MXU tiling constraints.
  * `_play_attention_xla`: chunked XLA fallback (CPU tests, odd shapes).

Shapes: q (B, Lq, D), k/v (B, Lk, D) -> (B, Lq, D). D is the head dim
(128 in PPMStereo — exactly one MXU lane tile).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _play_attention_xla(q, k, v, scale, q_chunk: int = 1024):
    """Blockwise softmax over query chunks; keys stay resident."""
    b, lq, d = q.shape
    orig_dtype = q.dtype

    pad = (-lq) % q_chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nq = q.shape[1] // q_chunk
    qb = q.reshape(b, nq, q_chunk, d)

    def chunk_fn(q_blk):
        # q_blk: (B, q_chunk, D)
        logits = (
            jnp.einsum("bqd,bkd->bqk", q_blk, k, preferred_element_type=jnp.float32)
            * scale
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkd->bqd", probs, v, preferred_element_type=jnp.float32)

    out = jax.lax.map(chunk_fn, jnp.moveaxis(qb, 1, 0))  # (nq, B, q_chunk, D)
    out = jnp.moveaxis(out, 0, 1).reshape(b, nq * q_chunk, d)
    return out[:, :lq].astype(orig_dtype)


_LOG2E = 1.4426950408889634
_LANES = 128


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, save_residuals=False
):
    """Online-softmax flash attention: grid = (batch, q_blocks, k_blocks).

    The k axis is the innermost (fastest) grid dim, so (m, l, acc) scratch
    carries softmax state across k blocks for a fixed q block.

    At d=128 single-head the kernel is VPU-bound (per-logit elementwise
    work rivals the 2x128-MAC MXU time), so the elementwise ops are
    trimmed: the softmax runs in base-2 (one multiply folds the scale and
    the ln->log2 conversion; jnp.exp lowers to exp2 plus that multiply
    anyway) and key-padding masking is compiled out entirely when kv_len
    is block-aligned — which _pick_block_k arranges on every production
    shape; the unaligned fallback pays a per-block iota select (a
    scalar cond skipping full blocks measured ~2x worse still).

    The m/l softmax state lives in (block_q, 128) full-lane tiles rather
    than (block_q, 1) columns: sub-lane-width scratch forces strided
    relayouts on every broadcast against the (block_q, block_k) logits,
    which measured 589 -> 1033 ms at the 720p play shape (the single
    biggest lever found for this kernel; layout borrowed from JAX's
    reference TPU flash kernel).

    With save_residuals (the grad-traced forward), the final base-2 row
    max and softmax denominator lane tiles are also written out for the
    flash backward kernels.
    """
    if save_residuals:
        m_out_ref, l_out_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # base-2 softmax: exp(scale*s - m) == exp2(scale*log2(e)*s - m2)
    s = s * (scale * _LOG2E)

    blk_k = k.shape[0]
    rem = kv_len % blk_k
    if rem:  # static: key padding exists (callers avoid this by picking a
        # block_k that divides kv_len — see _pick_block_k; a lax.cond that
        # skips full blocks measured ~2x WORSE than this plain select:
        # 146 vs ~75 ms at the 720p 1/8 shape)
        col = k_idx * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]  # (bq, 128)
    l_prev = l_ref[:]  # (bq, 128)
    m_cur = jnp.max(s, axis=1)[:, None]  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)   # (bq, 128)

    reps = s.shape[1] // _LANES
    p = jnp.exp2(s - (jnp.tile(m_new, (1, reps)) if reps > 1 else m_new))
    alpha = jnp.exp2(m_prev - m_new)     # (bq, 128)
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

    d = acc_ref.shape[1]
    d_tile = lambda x: jnp.tile(x, (1, d // _LANES)) if d > _LANES else x
    acc_ref[:] = acc_ref[:] * d_tile(alpha) + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / d_tile(l_ref[:])).astype(o_ref.dtype)
        if save_residuals:
            m_out_ref[0] = m_ref[:]
            l_out_ref[0] = l_ref[:]


def _flash_carry_kernel(
    q_ref, k_ref, v_ref, o0_ref, m0_ref, l0_ref,
    o_out_ref, m_out_ref, l_out_ref, m_ref, l_ref, acc_ref,
    *, scale, kv_len,
):
    """Flash attention hop WITH CARRY, for the ring play attention
    (parallel/ring_attention.py): starts from an incoming UNNORMALIZED
    (o, m, l) online-softmax state and emits the merged state instead of
    a normalized output. m is the base-2 row max (matching _flash_kernel's
    base-2 softmax); callers normalize o/l once after the last hop.
    Same tiling/layout as _flash_kernel (lane-tiled m/l state)."""
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = m0_ref[0]
        l_ref[:] = l0_ref[0]
        acc_ref[:] = o0_ref[0]

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
        col = k_idx * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=1)[:, None]
    m_new = jnp.maximum(m_prev, m_cur)

    reps = s.shape[1] // _LANES
    p = jnp.exp2(s - (jnp.tile(m_new, (1, reps)) if reps > 1 else m_new))
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

    d = acc_ref.shape[1]
    d_tile = lambda x: jnp.tile(x, (1, d // _LANES)) if d > _LANES else x
    acc_ref[:] = acc_ref[:] * d_tile(alpha) + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_out_ref[0] = acc_ref[:]
        m_out_ref[0] = m_ref[:]
        l_out_ref[0] = l_ref[:]


def flash_attend_carry(
    q, k, v, o, m, l, scale,
    block_q: int | None = None, block_k: int | None = None,
    interpret: bool = False,
):
    """One flash hop with carry: q (B,Lq,D) bf16, k/v (B,Lk,D) bf16,
    o (B,Lq,D) f32, m/l (B,Lq,LANES) f32 lane tiles in BASE-2 domain.
    Returns merged (o, m, l). Used per ring hop on TPU."""
    from jax.experimental.pallas import tpu as pltpu

    default_q, default_k = _carry_block_policy(q.shape[1], k.shape[1], q.shape[2])
    block_q = block_q or default_q
    block_k = block_k or default_k
    b, lq, d = q.shape
    lk = k.shape[1]

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, pad_q), (0, 0)))
        m = jnp.pad(m, ((0, 0), (0, pad_q), (0, 0)),
                    constant_values=_NEG_INF)
        l = jnp.pad(l, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = q.shape[1], k.shape[1]

    q_spec = pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0))
    k_spec = pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0))
    r_spec = pl.BlockSpec(
        (1, block_q, _LANES), lambda bi, qi, ki: (bi, qi, 0))
    o_new, m_new, l_new = pl.pallas_call(
        functools.partial(_flash_carry_kernel, scale=scale, kv_len=lk),
        grid=(b, lq_p // block_q, lk_p // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec],
        out_specs=[q_spec, r_spec, r_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, lq_p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, lq_p, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, m, l)
    if pad_q:
        o_new = o_new[:, :lq]
        m_new = m_new[:, :lq]
        l_new = l_new[:, :lq]
    return o_new, m_new, l_new


def _pick_block_k(kv_len: int) -> int:
    """Largest well-measured block_k that divides kv_len, so the kernel
    compiles with NO key-padding mask: any in-kernel masking of the tail
    block measured ~2x slower at unaligned shapes (146 vs ~75 ms at the
    720p 1/8 play shape). 640 divides every production bank length
    (top_k * H/4 * W/4 with H,W multiples of 32 and an even tile count);
    512/256 cover the pow-2 cases. Falls back to 512 + tail mask.
    """
    for bk in (512, 640, 256, 384, 128):
        if kv_len % bk == 0:
            return bk
    return 512


def _block_policy(lq: int, lk: int) -> tuple[int, int]:
    """Default (block_q, block_k). 2048/512 measured 78% of bf16 peak at
    the 720p 1/4-scale play shape (10x58880x294400xd128, v5e) with the
    lane-tiled m/l layout, and 21.0 ms at the short shape
    (10x10240x51200xd128); 4096/256 reached 81.8% but larger-bq grids
    hit flaky remote-compile failures, so the default stays at the
    robust point. Small coarse-scale queries step down to avoid padding
    waste. Single source of truth: the grad-traced forward must use the
    same blocks as the primal or the two would differ in f32
    accumulation order.
    """
    block_k = _pick_block_k(lk)
    block_q = 2048 if lq >= 8192 else (1024 if lq >= 4096 else 512)
    return block_q, block_k


def _carry_vmem_bytes(bq: int, bk: int, d: int) -> int:
    """Scoped-VMEM working-set estimate for _flash_carry_kernel: the
    pipeline double-buffers every in/out block (q bf16, k+v bf16, o0 +
    o_out f32, m0/l0/m_out/l_out f32 lane tiles) plus single-buffered
    scratch (m, l, acc).

    Calibrated against the compiler: at bq=2048/bk=640/d=128 the raw
    inventory models 16.6 MB but the Mosaic compiler reported 23 MB
    scoped VMEM (v5e, 2026-08-20) — a 1.39x ratio from allocator
    padding/alignment the inventory cannot see. The 1.4x factor below
    folds that in so the 14 MB policy budget is a real bound on what
    the compiler will request, not just on the raw inventory."""
    per_copy = (
        bq * d * 2          # q
        + 2 * bk * d * 2    # k, v
        + 2 * bq * d * 4    # o0, o_out
        + 4 * bq * _LANES * 4  # m0, l0, m_out, l_out
    )
    scratch = bq * d * 4 + 2 * bq * _LANES * 4  # acc, m, l
    return int(1.4 * (2 * per_copy + scratch))


def _carry_block_policy(lq: int, lk: int, d: int = 128) -> tuple[int, int]:
    """Block policy for the ring-hop carry kernel. Starts from the batch
    kernel's measured-optimal blocks, then shrinks block_q (and block_k
    as a last resort) until the double-buffered working set fits the
    16 MB scoped-VMEM limit: the carry variant holds the unnormalized
    (o, m, l) state as three extra in/out pairs plus scratch, so the
    batch policy's block_q=2048 OOMs the compiler at production ring
    shapes (measured 2026-08-20: 23 MB requested vs 16 MB limit at the
    720p/k20 space=4 shard, q 14720 x kv 73600 — a failure only real
    TPU compilation surfaces; interpret mode has no VMEM model)."""
    budget = 14 << 20  # leave headroom under the 16 MB scoped limit
    bq, bk = _block_policy(lq, lk)
    while bq > 256 and _carry_vmem_bytes(bq, bk, d) > budget:
        bq //= 2
    while bk > 128 and _carry_vmem_bytes(bq, bk, d) > budget:
        bk //= 2
    return bq, bk


def _play_attention_pallas(
    q, k, v, scale, block_q: int | None = None, block_k: int | None = None,
    interpret: bool = False,
):
    default_q, default_k = _block_policy(q.shape[1], k.shape[1])
    if block_k is None:
        block_k = default_k
    if block_q is None:
        block_q = default_q
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

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
        functools.partial(_flash_kernel, scale=scale, kv_len=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :lq]


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, linv_ref, di_ref, dq_ref,
    dq_acc_ref, *, scale,
):
    """dq = scale * [pn ∘ (do V^T - di)] K, accumulated over k blocks.

    pn is recomputed from the saved base-2 row max m and inverse
    denominator linv; di = rowsum(do ∘ o) is precomputed in XLA. All
    per-row residuals arrive as (block_q, 128) lane tiles whose block
    index is constant over the k grid dim, so they are fetched once per
    q block. Requires kv_len % block_k == 0 (callers guarantee it via
    _pick_block_k; padded keys would otherwise contribute exp2(-m)).
    """
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    reps = s.shape[1] // _LANES
    tile = lambda x: jnp.tile(x, (1, reps)) if reps > 1 else x
    pn = jnp.exp2(s - tile(m_ref[0])) * tile(linv_ref[0])

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = pn * (dp - tile(di_ref[0]))

    dq_acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == num_k - 1)
    def _finish():
        dq_ref[0] = (dq_acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, linv_ref, di_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref, *, scale,
):
    """dk = scale * ds^T Q and dv = pn^T dO, accumulated over q blocks
    (grid: batch, k_blocks, q_blocks with q innermost). Padded q rows
    have NONZERO pn (their l from the forward is kv_len, not 0); they
    contribute nothing only because dO and di are zero-padded, making
    their dv rows and ds rows exactly 0 — keep that padding.
    """
    q_idx = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    reps = s.shape[1] // _LANES
    tile = lambda x: jnp.tile(x, (1, reps)) if reps > 1 else x
    pn = jnp.exp2(s - tile(m_ref[0])) * tile(linv_ref[0])

    dv_acc_ref[:] += jax.lax.dot_general(
        pn.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = pn * (dp - tile(di_ref[0]))
    dk_acc_ref[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q - 1)
    def _finish():
        dk_ref[0] = (dk_acc_ref[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _flash_fwd_res(q, k, v, scale, block_q, block_k, interpret=False):
    """Forward with residuals. Returns (out[B,Lq,D], m2[B,Lq_p,128],
    l[B,Lq_p,128]) — m2/l stay padded (lane-tiled) for the bwd kernels.
    """
    from jax.experimental.pallas import tpu as pltpu

    b, lq, d = q.shape
    lk = k.shape[1]
    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = q.shape[1]
    assert lk % block_k == 0, "flash bwd path requires aligned kv_len"

    grid = (b, lq_p // block_q, lk // block_k)
    out, m2, l = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=lk, save_residuals=True
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda bi, qi, ki: (bi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, lq_p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, lq_p, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :lq], m2, l


def _flash_bwd(q, k, v, o, m2, l, g, scale, block_q, block_k, interpret=False):
    """Flash backward: dq kernel (k-streaming) + dkv kernel (q-streaming)."""
    from jax.experimental.pallas import tpu as pltpu

    b, lq, d = q.shape
    lk = k.shape[1]
    assert lk % block_k == 0
    pad_q = (-lq) % block_q
    lq_p = lq + pad_q

    di = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    # lane-tile the per-row residuals. Correctness of padded q rows rests
    # on dO and di being ZERO-padded (their pn is nonzero: the forward
    # gives pad rows l = kv_len): dv rows become pn^T·0 = 0 and
    # ds = pn*(0-0) = 0, and the garbage dq pad rows are sliced off.
    di = jnp.broadcast_to(di[..., None], (b, lq, _LANES))
    linv = jnp.where(l > 0.0, 1.0 / l, 0.0)  # guard, l>0 for real rows
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
        di = jnp.pad(di, ((0, 0), (0, pad_q), (0, 0)))
    g = g.astype(q.dtype)

    q_spec = pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0))
    k_spec = pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0))
    r_spec = pl.BlockSpec((1, block_q, _LANES), lambda bi, qi, ki: (bi, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b, lq_p // block_q, lk // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec, r_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, g, m2, linv, di)

    # dkv grid: k blocks outer, q blocks inner
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda bi, ki, qi: (bi, qi, 0))
    k_spec2 = pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0))
    r_spec2 = pl.BlockSpec((1, block_q, _LANES), lambda bi, ki, qi: (bi, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b, lk // block_k, lq_p // block_q),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, r_spec2, r_spec2, r_spec2],
        out_specs=[k_spec2, k_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, g, m2, linv, di)

    return dq[:, :lq], dk, dv


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _attention_bwd_xla(scale, res, g, q_chunk: int = 1024):
    """Recompute-based attention backward, chunked over query blocks.

    Standard softmax-attention gradients with f32 logits:
      P = softmax(scale * Q K^T)
      dV = P^T g;  dP = g V^T;  dS = P * (dP - rowsum(dP * P))
      dQ = scale * dS K;  dK = scale * dS^T Q
    """
    q, k, v = res
    b, lq, d = q.shape
    pad = (-lq) % q_chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    nq = q.shape[1] // q_chunk
    qb = jnp.moveaxis(q.reshape(b, nq, q_chunk, d), 1, 0)
    gb = jnp.moveaxis(g.reshape(b, nq, q_chunk, d), 1, 0)

    def chunk_fn(carry, qg):
        dk_acc, dv_acc = carry
        q_blk, g_blk = qg
        s = jnp.einsum("bqd,bkd->bqk", q_blk, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        g32 = g_blk.astype(jnp.float32)
        dv = jnp.einsum("bqk,bqd->bkd", p, g32)
        dp = jnp.einsum("bqd,bkd->bqk", g32, v.astype(jnp.float32))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = scale * jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32))
        dk = scale * jnp.einsum("bqk,bqd->bkd", ds, q_blk.astype(jnp.float32))
        return (dk_acc + dk, dv_acc + dv), dq

    (dk, dv), dq = jax.lax.scan(
        chunk_fn,
        (
            jnp.zeros(k.shape, jnp.float32),
            jnp.zeros(v.shape, jnp.float32),
        ),
        (qb, gb),
    )
    dq = jnp.moveaxis(dq, 0, 1).reshape(b, nq * q_chunk, d)[:, :lq]
    return dq.astype(res[0].dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _play_attention_tpu(q, k, v, scale):
    return _play_attention_pallas(q, k, v, scale)


def _play_attention_tpu_fwd(q, k, v, scale):
    return _play_attention_pallas(q, k, v, scale), (q, k, v)


def _play_attention_tpu_bwd(scale, res, g):
    return _attention_bwd_xla(scale, res, g)


_play_attention_tpu.defvjp(_play_attention_tpu_fwd, _play_attention_tpu_bwd)


def _flash_bwd_enabled() -> bool:
    """Flash backward (Pallas dq + dkv kernels) — default ON: measured
    38.3 ms fwd+bwd vs 145.6 ms for the chunked-XLA-recompute backward at
    the train play shape (artifacts/micro_attn_bwd.py, v5e 2026-08-18);
    also beats jax's reference flash pair (45.9 ms). Set PPM_FLASH_BWD=0
    to fall back. Read per call so setting the env var after import
    (tests, notebooks, A/B harnesses) takes effect.
    """
    return os.environ.get("PPM_FLASH_BWD", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _play_attention_tpu_flashbwd(q, k, v, scale):
    return _play_attention_pallas(q, k, v, scale)


def _play_attention_tpu_flashbwd_fwd(q, k, v, scale):
    block_q, block_k = _block_policy(q.shape[1], k.shape[1])
    out, m2, l = _flash_fwd_res(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, m2, l)


def _play_attention_tpu_flashbwd_bwd(scale, res, g):
    q, k, v, o, m2, l = res
    block_q, block_k = _block_policy(q.shape[1], k.shape[1])
    return _flash_bwd(q, k, v, o, m2, l, g, scale, block_q, block_k)


_play_attention_tpu_flashbwd.defvjp(
    _play_attention_tpu_flashbwd_fwd, _play_attention_tpu_flashbwd_bwd
)


def play_attention(q, k, v, scale: float, force_xla: bool = False):
    """Dispatch: Pallas flash kernel on TPU (custom VJP: flash forward,
    chunked recompute backward), chunked XLA elsewhere.

    The reference computes this in bf16 (ppmstereo.py:550); callers pass
    bf16 q/k/v under the mixed-precision policy and the softmax runs in f32
    either way.
    """
    d = q.shape[-1]
    if force_xla or not _on_tpu() or d % 128 != 0:
        return _play_attention_xla(q, k, v, scale)
    if _flash_bwd_enabled() and k.shape[1] % _pick_block_k(k.shape[1]) == 0:
        return _play_attention_tpu_flashbwd(q, k, v, scale)
    return _play_attention_tpu(q, k, v, scale)
