"""Micro-benchmarks for the round-2 perf levers found by profile_iter.py.

1. play gather: one-hot einsum (current) vs take along the T axis
   (T is a leading axis — the lane-gather pathology should not apply).
2. 3-D 3x3x3 conv (flow/mask heads) vs sum of 3 temporally-shifted 2-D
   3x3 convs (identical math, better-optimized 2-D lowering?).
3. depthwise 7x7 at 36 ch: grouped conv (VPU, 36/128 lanes used) vs the
   same op as a dense conv with a diagonal kernel (MXU).
4. cnet split: ConvNeXt backbone vs decoder head; LayerNorm+GRN cost.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

N = 20
rng = np.random.default_rng(0)
bf = jnp.bfloat16


def timeit(name, fn, *args, n=N):
    def looped(*args):
        def body(i, acc):
            out = fn(*[a + (acc * 1e-30).astype(a.dtype) for a in args])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jfn = jax.jit(looped)
    float(jnp.asarray(jfn(*args)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:34s} {min(ts)/n*1e3:8.3f} ms", flush=True)


r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))

# ---------------------------------------------------------------- 1. gather
B, T, H, W, C, K = 1, 10, 80, 128, 128, 5
key_aug = r(B, T, H, W, 2 * C).astype(bf)
value = r(B, T, H, W, C).astype(bf)
idx = jnp.asarray(rng.integers(0, T, (B, T, K)), jnp.int32)

print("1. play gather (key_aug 256ch + value 128ch):", flush=True)


def gather_onehot(key_aug, value, idx):
    onehot = jax.nn.one_hot(idx, T, dtype=key_aug.dtype)

    def g(x):
        return jnp.einsum(
            "brkt,bthwc->brkhwc", onehot, x, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    return g(key_aug), g(value)


def gather_take(key_aug, value, idx):
    # vmap over batch: take picked frames along the leading T axis
    def g(x):
        return jax.vmap(lambda xb, ib: jnp.take(xb, ib.reshape(-1), axis=0))(
            x, idx
        ).reshape(x.shape[0], T, K, *x.shape[2:])

    return g(key_aug), g(value)


timeit("one-hot einsum", lambda k, v: gather_onehot(k, v, idx)[0], key_aug, value)
timeit("take axis=0/T", lambda k, v: gather_take(k, v, idx)[0], key_aug, value)
a = gather_onehot(key_aug, value, idx)[0]
b = gather_take(key_aug, value, idx)[0]
print(f"  max|diff| {float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))):.2e}", flush=True)

# ------------------------------------------------------------- 2. 3D conv
print("2. 3x3x3 conv 128->256 at (1,10,80,128):", flush=True)
x3 = r(B, T, H, W, C).astype(bf)
w3 = r(3, 3, 3, C, 256)
b3 = r(256)


def conv3d(x, w, b):
    out = jax.lax.conv_general_dilated(
        x.reshape(B, T, H, W, C), w.astype(x.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    return out + b.astype(x.dtype)


def conv3d_as_2d(x, w, b):
    # out[t] = sum_dt conv2d(x[t+dt-1]; w[dt]) — fold T into batch for the
    # 2-D convs, shift along T for the sum
    xb = x.reshape(B * T, H, W, C)
    outs = []
    for dt in range(3):
        o = jax.lax.conv_general_dilated(
            xb, w[dt].astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(o.reshape(B, T, H, W, 256))
    zero = jnp.zeros_like(outs[0][:, :1])
    # correlation convention: out[t] = sum_kt conv2d(x[t+kt-1]; w[kt])
    out = (
        jnp.concatenate([zero, outs[0][:, :-1]], axis=1)  # w[0] <- x[t-1]
        + outs[1]
        + jnp.concatenate([outs[2][:, 1:], zero], axis=1)  # w[2] <- x[t+1]
    )
    return out + b.astype(x.dtype)


timeit("conv3d native", conv3d, x3, w3, b3)
timeit("3x shifted conv2d", conv3d_as_2d, x3, w3, b3)
a = conv3d(x3.astype(jnp.float32), w3, b3)
b_ = conv3d_as_2d(x3.astype(jnp.float32), w3, b3)
print(f"  max|diff| {float(jnp.max(jnp.abs(a-b_))):.2e}", flush=True)

# ------------------------------------------------- 3. depthwise 36ch on MXU
print("3. depthwise 7x7 @ 36ch:", flush=True)
xd = r(10, 80, 128, 36).astype(bf)
wd = r(7, 7, 1, 36)
bd = r(36)


def dw_grouped(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=36,
    )
    return out + b.astype(x.dtype)


def dw_diag(x, w, b):
    wdense = w[:, :, 0, :, None] * jnp.eye(36, dtype=w.dtype)  # (7,7,36,36)
    out = jax.lax.conv_general_dilated(
        x, wdense.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b.astype(x.dtype)


timeit("grouped (VPU)", dw_grouped, xd, wd, bd)
timeit("diagonal dense (MXU)", dw_diag, xd, wd, bd)
a = dw_grouped(xd.astype(jnp.float32), wd, bd)
b_ = dw_diag(xd.astype(jnp.float32), wd, bd)
print(f"  max|diff| {float(jnp.max(jnp.abs(a-b_))):.2e}", flush=True)

# ---------------------------------------------------------- 4. cnet pieces
print("4. cnet pieces (320x512, T=10):", flush=True)
from ppmstereo_tpu.nn.convnext import ConvNeXtV2, ContextNet

img = r(10, 320, 512, 3).astype(bf)
bb = ConvNeXtV2("tiny", dtype=bf)
pb = jax.jit(bb.init)(jax.random.PRNGKey(0), img)
timeit("backbone alone", lambda x: bb.apply(pb, x)[0], img, n=5)

cn = ContextNet("tiny", output_dim=256, dtype=bf)
pc = jax.jit(cn.init)(jax.random.PRNGKey(0), img)
timeit("full cnet", lambda x: cn.apply(pc, x)[0], img, n=5)

# LayerNorm + GRN at stage-1 shape
xs = r(10, 80, 128, 96).astype(bf)
ln = jax.nn.standardize  # quick stand-in: mean/var over last axis


def ln_grn(x):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = ((x - m) / jnp.sqrt(v + 1e-6)).astype(x.dtype)
    x32 = y.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(x32**2, axis=(-3, -2), keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return (x32 * nx + x32).astype(x.dtype)


timeit("LN+GRN @ stage1", ln_grn, xs)
