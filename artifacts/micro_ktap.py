"""Pallas K-tap 1-D conv (along W, accumulated matmuls) vs XLA conv.

GRU width-pass shapes: x (B*T*H=800 rows, W=128, C=512), kernel (1,1,15)
C=512->F=128. The conv along W is K shifted (rows*W, C)x(C, F) matmuls
accumulated in VMEM — input read once, M=BR*W per program.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N = 20
rng = np.random.default_rng(0)
bf = jnp.bfloat16


def _ktap_kernel(x_ref, w_ref, o_ref, *, K, L):
    acc = None
    for k in range(K):
        xk = x_ref[:, k : k + L, :]
        t = jax.lax.dot_general(
            xk, w_ref[k], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    o_ref[:] = acc.astype(o_ref.dtype)


def ktap_conv_pallas(x, w, BR=8):
    """x (R, L, C); w (K, C, F); 'same' zero padding. Returns (R, L, F)."""
    R, L, C = x.shape
    K, _, F = w.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    grid = (R // BR,)
    return pl.pallas_call(
        functools.partial(_ktap_kernel, K=K, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, L + K - 1, C), lambda r: (r, 0, 0)),
            pl.BlockSpec((K, C, F), lambda r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BR, L, F), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, L, F), x.dtype),
    )(xp, w)


def ktap_conv_xla(x, w):
    K = w.shape[0]
    p = K // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),  # (K, C, F) = HIO for 1-D conv
        window_strides=(1,), padding=[(p, p)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def timeit(name, fn, *args):
    def looped(*args):
        def body(i, acc):
            out = fn(args[0] + (acc * 1e-30).astype(args[0].dtype), *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(looped)
    float(jnp.asarray(jfn(*args)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)/N*1e3:8.3f} ms", flush=True)


r = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.05).astype(np.float32))

CASES = [
    ("width big z (K=15, 512->128)", 800, 128, 512, 128, 15),
    ("width big z+r fused (->256)", 800, 128, 512, 256, 15),
    ("width small (K=5, 128->128)", 800, 128, 128, 128, 5),
    ("width q (K=5, 512->128)", 800, 128, 512, 128, 5),
]

for name, R, L, C, F, K in CASES:
    x = r(R, L, C).astype(bf)
    w = r(K, C, F)
    print(f"{name}:", flush=True)
    timeit("xla conv", ktap_conv_xla, x, w.astype(bf))
    for BR in (8, 16):
        try:
            timeit(f"pallas BR={BR}", lambda xx, ww: ktap_conv_pallas(xx, ww, BR), x, w.astype(bf))
        except Exception as e:
            print(f"  pallas BR={BR} FAILED: {type(e).__name__}: {e}", flush=True)
    ref = ktap_conv_xla(x.astype(jnp.float32), w)
    got = ktap_conv_pallas(x.astype(jnp.float32), w)
    print(f"  max|diff| {float(jnp.max(jnp.abs(ref-got))):.2e}", flush=True)
