"""Depthwise 7x7 conv on TPU: XLA grouped conv vs shift-accumulate.

cnet (ConvNeXt) measured ~1% MXU and the PCBlock motion encoder 6.8 ms/it;
both are dominated by depthwise convs. A KxK depthwise conv is K^2 shifted
elementwise multiply-adds — pure VPU work XLA can fuse into one pass —
so it may beat the grouped-conv lowering. Measures both at the real shapes.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

N = 30
rng = np.random.default_rng(0)


def dw_xla(x, w, b):
    # w: (K, K, 1, C) flax grouped-conv kernel layout
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out + b.astype(x.dtype)


def dw_shift(x, w, b):
    k = w.shape[0]
    p = k // 2
    h, wd = x.shape[-3], x.shape[-2]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = None
    for dy in range(k):
        for dx in range(k):
            tap = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (x.shape[0], h, wd, x.shape[-1])
            )
            term = tap * w[dy, dx, 0].astype(x.dtype)
            out = term if out is None else out + term
    return out + b.astype(x.dtype)


def timeit(name, fn, x, w, b):
    def looped(x, w, b):
        def body(i, acc):
            out = fn(x + (acc * 1e-30).astype(x.dtype), w, b)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(looped)
    float(jnp.asarray(jfn(x, w, b)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(x, w, b)))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:16s} {min(ts)/N*1e3:8.3f} ms", flush=True)


SHAPES = [
    ("cnet /4 (x3 blk)", (10, 80, 128, 96)),
    ("cnet /8 (x3 blk)", (10, 40, 64, 192)),
    ("cnet /16 (x9 blk)", (10, 20, 32, 384)),
    ("cnet /32 (x3 blk)", (10, 10, 16, 768)),
    ("PCBlock corr 1/4", (10, 80, 128, 36)),
]

for name, shp in SHAPES:
    c = shp[-1]
    x = jnp.asarray(rng.standard_normal(shp).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 1, c)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    print(f"{name} {shp}:", flush=True)
    timeit("xla grouped", dw_xla, x, w, b)
    timeit("shift-accum", dw_shift, x, w, b)
    # parity
    ref = dw_xla(x.astype(jnp.float32), w, b)
    got = dw_shift(x.astype(jnp.float32), w, b)
    print(f"  max|diff| {float(jnp.max(jnp.abs(ref-got))):.2e}", flush=True)
