"""Microbench: fused z+r gate conv vs two separate convs (TPU v5e).

Hypothesis: the GRU gate convs (two 128-out convs over the same concat
input) pipeline better as one 256-out conv (with the second _SKConv
stage grouped so the math is identical). Width-pass shapes of
SKSepConvGRU3D at 1/4 scale of 320x512, T=10.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
from jax import lax

B, T, H, W = 1, 10, 80, 128
CIN, D = 512, 128
N_ITER = 30


def timeit(name, fn, *args):
    _ = float(jnp.asarray(fn(*args)).mean())  # warmup incl. real fetch
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).mean())  # force real fetch (tunnel quirk)
        best = min(best, (time.perf_counter() - t0) / N_ITER * 1e3)
    print(f"{name:44s} {best:8.3f} ms/iter", flush=True)
    return best


def conv_w(x, kern, groups=1):
    k = kern.shape[2]
    return lax.conv_general_dilated(
        x, kern, (1, 1, 1), [(0, 0), (0, 0), (k // 2, k // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
    )


key = jax.random.PRNGKey(0)
x0 = jax.random.normal(key, (B, T, H, W, CIN), jnp.bfloat16)


def make_sep():
    kz15 = jax.random.normal(key, (1, 1, 15, CIN, D), jnp.bfloat16) * 0.02
    kr15 = jax.random.normal(key, (1, 1, 15, CIN, D), jnp.bfloat16) * 0.02
    kz5 = jax.random.normal(key, (1, 1, 5, D, D), jnp.bfloat16) * 0.02
    kr5 = jax.random.normal(key, (1, 1, 5, D, D), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, kz15, kr15, kz5, kr5):
        def body(c, _):
            z = conv_w(jax.nn.gelu(conv_w(c, kz15)), kz5)
            r = conv_w(jax.nn.gelu(conv_w(c, kr15)), kr5)
            upd = jax.nn.sigmoid(z) * c[..., :D] + jax.nn.sigmoid(r)
            return c.at[..., :D].set(upd), ()
        out, _ = lax.scan(body, x, None, length=N_ITER)
        return out.mean()

    return lambda: run(x0, kz15, kr15, kz5, kr5)


def make_fused():
    kzr15 = jax.random.normal(key, (1, 1, 15, CIN, 2 * D), jnp.bfloat16) * 0.02
    # grouped: each 128-block of the 256 input feeds its own 128 outputs
    kzr5 = jax.random.normal(key, (1, 1, 5, D, 2 * D), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, kzr15, kzr5):
        def body(c, _):
            y = conv_w(jax.nn.gelu(conv_w(c, kzr15)), kzr5, groups=2)
            z, r = jnp.split(y, 2, axis=-1)
            upd = jax.nn.sigmoid(z) * c[..., :D] + jax.nn.sigmoid(r)
            return c.at[..., :D].set(upd), ()
        out, _ = lax.scan(body, x, None, length=N_ITER)
        return out.mean()

    return lambda: run(x0, kzr15, kzr5)


def make_fused_dense5():
    """Variant: fuse stage-1, keep stage-2 as two separate dense convs."""
    kzr15 = jax.random.normal(key, (1, 1, 15, CIN, 2 * D), jnp.bfloat16) * 0.02
    kz5 = jax.random.normal(key, (1, 1, 5, D, D), jnp.bfloat16) * 0.02
    kr5 = jax.random.normal(key, (1, 1, 5, D, D), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, kzr15, kz5, kr5):
        def body(c, _):
            y = jax.nn.gelu(conv_w(c, kzr15))
            z = conv_w(y[..., :D], kz5)
            r = conv_w(y[..., D:], kr5)
            upd = jax.nn.sigmoid(z) * c[..., :D] + jax.nn.sigmoid(r)
            return c.at[..., :D].set(upd), ()
        out, _ = lax.scan(body, x, None, length=N_ITER)
        return out.mean()

    return lambda: run(x0, kzr15, kz5, kr5)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # FLOPs of the conv pair per scan step (z+r branches):
    pos = B * T * H * W
    flops = 2 * pos * (15 * CIN * 2 * D + 5 * D * 2 * D)
    print(f"analytic: {flops/1e9:.1f} GFLOP/step -> "
          f"{flops/197e12*1e3:.2f} ms at v5e bf16 peak")
    a = timeit("separate z,r (2x [15-conv,gelu,5-conv])", make_sep())
    b = timeit("fused stage1+grouped stage2 (256 out)", make_fused())
    c = timeit("fused stage1, separate dense stage2", make_fused_dense5())
    print(f"fused/grouped speedup: {a/b:.2f}x ; fused/dense5: {a/c:.2f}x")
