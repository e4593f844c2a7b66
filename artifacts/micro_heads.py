"""Head-conv fusion micro: flow_head.conv1 + mask_conv1 share input `net`.

Both are 3x3x3 128->256 convs on the GRU output followed by relu. Fusing
them into one 128->512 conv (concatenated kernels, then split) is
mathematically identical. Measures separate vs fused at the production
1/4-scale shape, plus the uncertainty head for reference.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

N = 20
rng = np.random.default_rng(0)
bf = jnp.bfloat16
B, T, H, W, C = 1, 10, 80, 128, 128


def conv3d(x, w, b, pad=1):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(pad, pad)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    return out + b.astype(x.dtype)


def conv1x1(x, w, b):
    return conv3d(x, w, b, pad=0)


r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
net = r(B, T, H, W, C).astype(bf)
wf1, bf1 = r(3, 3, 3, 128, 256), r(256)
wf2, bf2 = r(3, 3, 3, 256, 2), r(2)
wm1, bm1 = r(3, 3, 3, 128, 256), r(256)
wm2, bm2 = r(1, 1, 1, 256, 432), r(432)
wfused = jnp.concatenate([wf1, wm1], axis=-1)
bfused = jnp.concatenate([bf1, bm1], axis=-1)


def heads_separate(net):
    hf = jax.nn.relu(conv3d(net, wf1, bf1))
    delta = conv3d(hf, wf2, bf2)
    hm = jax.nn.relu(conv3d(net, wm1, bm1))
    mask = 0.25 * conv1x1(hm, wm2, bm2)
    return delta, mask


def heads_fused(net):
    h = jax.nn.relu(conv3d(net, wfused, bfused))
    delta = conv3d(h[..., :256], wf2, bf2)
    mask = 0.25 * conv1x1(h[..., 256:], wm2, bm2)
    return delta, mask


def timeit(name, fn, x):
    def looped(x):
        def body(i, acc):
            d, m = fn(x + (acc * 1e-30).astype(x.dtype))
            return acc + (jnp.sum(d.astype(jnp.float32)) + jnp.sum(m.astype(jnp.float32))) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    jfn = jax.jit(looped)
    float(jnp.asarray(jfn(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(x)))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:22s} {min(ts)/N*1e3:8.3f} ms", flush=True)


print(f"heads at (B,T,H,W,C)=({B},{T},{H},{W},{C}):", flush=True)
timeit("separate conv1s", heads_separate, net)
timeit("fused conv1 (512)", heads_fused, net)
da, ma = heads_separate(net.astype(jnp.float32))
db, mb = heads_fused(net.astype(jnp.float32))
print(f"  max|d diff| {float(jnp.max(jnp.abs(da-db))):.2e}  max|m diff| {float(jnp.max(jnp.abs(ma-mb))):.2e}", flush=True)
