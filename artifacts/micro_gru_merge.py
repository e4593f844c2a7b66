"""A/B the merged-gate SKSepConvGRU3D restructure before wiring it in.

micro_gru_inmodel_gap.py showed the module's 11.6 ms/iter is intrinsic
(isolated == in-model), so the remaining lever is algebraic: the z and r
gates of every pass read the IDENTICAL [h, x] input, so their convs can
be one conv with concatenated output channels (bit-identical math; each
output channel's accumulation is unchanged).  Variants:

  A  module apply as shipped (3 convs per pass + 2 small)
  B  z+r merged per pass: width big (512->256) + 2 small, height/time
     (512->256); q conv unchanged
  C  B, with the width small convs as one grouped conv (groups=2)
  D  B, plus q folded by linearity on height/time passes: the merged
     conv computes [z_pre, r_pre, qx_pre] (512->384, q rows zero over
     the h channels) and q = tanh(qx_pre + conv_qh(r*h)) with a bias-
     free 128->128 conv.  Extra FLOPs on the zero block, one fewer
     conv op per pass.

Run ON TPU: PYTHONPATH=/root/repo python artifacts/micro_gru_merge.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ppmstereo_tpu.nn.gru import SKSepConvGRU3D

B, T, H, W = 1, 10, 80, 128
HID, XDIM = 128, 384
N = 16

rng = np.random.default_rng(0)
bf = lambda *s: jnp.asarray(
    rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
h0 = bf(B, T, H, W, HID)
x0 = bf(B, T, H, W, XDIM)

gru = SKSepConvGRU3D(hidden_dim=HID, dtype=jnp.bfloat16)
params = gru.init(jax.random.PRNGKey(0), h0, x0)
P = params["params"]

DN = ("NDHWC", "DHWIO", "NDHWC")


def conv(x, kern, bias=None):
    k = kern.shape[:3]
    widths = [(0, 0)] + [(ki // 2, ki // 2) for ki in k] + [(0, 0)]
    if any(p for w in widths for p in w):
        x = jnp.pad(x, widths)
    y = lax.conv_general_dilated(
        x, kern.astype(jnp.bfloat16), (1, 1, 1), "VALID",
        dimension_numbers=DN)
    if bias is not None:
        y = y + bias.astype(jnp.bfloat16)
    return y


def kb(path):
    node = P
    for part in path.split("/"):
        node = node[part]
    if "kernel" not in node:  # Conv wrapper nests the flax nn.Conv as Conv_0
        node = node["Conv_0"]
    return node["kernel"], node["bias"]


def gelu(v):
    return jax.nn.gelu(v, approximate=False)


def merged_iter(h, x, fold_q, grouped_small):
    hx = jnp.concatenate([h, x], axis=-1)
    # width pass: merged big z|r, gelu, smalls, q
    zb_k, zb_b = kb("_SKConv_0/Conv_0/Conv_0")
    rb_k, rb_b = kb("_SKConv_1/Conv_0/Conv_0")
    big = gelu(conv(hx, jnp.concatenate([zb_k, rb_k], -1),
                    jnp.concatenate([zb_b, rb_b])))
    zs_k, zs_b = kb("_SKConv_0/Conv_1/Conv_0")
    rs_k, rs_b = kb("_SKConv_1/Conv_1/Conv_0")
    if grouped_small:
        blk = jnp.zeros((1, 1, 5, 256, 128), zs_k.dtype)
        blk = blk.at[..., :128, :].set(zs_k)
        blk2 = jnp.zeros((1, 1, 5, 256, 128), rs_k.dtype)
        blk2 = blk2.at[..., 128:, :].set(rs_k)
        zr = conv(big, jnp.concatenate([blk, blk2], -1),
                  jnp.concatenate([zs_b, rs_b]))
        z, r = jax.nn.sigmoid(zr[..., :HID]), jax.nn.sigmoid(zr[..., HID:])
    else:
        z = jax.nn.sigmoid(conv(big[..., :HID], zs_k, zs_b))
        r = jax.nn.sigmoid(conv(big[..., HID:], rs_k, rs_b))
    q_k, q_b = kb("Conv_0")
    q = jnp.tanh(conv(jnp.concatenate([r * h, x], -1), q_k, q_b))
    h = (1 - z) * h + z * q

    # height then time passes
    for zi, ri, qi in (("Conv_1", "Conv_2", "Conv_3"),
                       ("Conv_4", "Conv_5", "Conv_6")):
        hx = jnp.concatenate([h, x], axis=-1)
        z_k, z_b = kb(zi)
        r_k, r_b = kb(ri)
        q_k, q_b = kb(qi)
        if fold_q:
            qx_rows = jnp.zeros_like(q_k)
            qx_rows = qx_rows.at[..., HID:, :].set(q_k[..., HID:, :])
            m = conv(hx, jnp.concatenate([z_k, r_k, qx_rows], -1),
                     jnp.concatenate([z_b, r_b, q_b]))
            z = jax.nn.sigmoid(m[..., :HID])
            r = jax.nn.sigmoid(m[..., HID:2 * HID])
            q = jnp.tanh(m[..., 2 * HID:] + conv(r * h, q_k[..., :HID, :]))
        else:
            m = conv(hx, jnp.concatenate([z_k, r_k], -1),
                     jnp.concatenate([z_b, r_b]))
            z = jax.nn.sigmoid(m[..., :HID])
            r = jax.nn.sigmoid(m[..., HID:])
            q = jnp.tanh(conv(jnp.concatenate([r * h, x], -1), q_k, q_b))
        h = (1 - z) * h + z * q
    return h


def bench(name, step):
    def chain(h, x):
        return lax.fori_loop(0, N, lambda _, cur: step(cur, x), h)

    fn = jax.jit(chain)
    t0 = time.time()
    out = fn(h0, x0)  # device output kept for full-tensor comparison
    first = float(jnp.mean(out))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(fn(h0, x0)))
        ts.append((time.perf_counter() - t0) / N)
    print(f"{name}: {min(ts)*1e3:.2f} ms/iter (mean {first:.5f}, "
          f"compile {compile_s:.0f}s, all {[f'{t*1e3:.2f}' for t in ts]})",
          flush=True)
    return out


ref = bench("A module", lambda h, x: gru.apply(params, h, x))
for name, fold_q, grp in (("B zr-merged", False, False),
                          ("C zr-merged grouped-small", False, True),
                          ("D zr+qx-merged", True, False)):
    got = bench(name, lambda h, x, f=fold_q, g=grp: merged_iter(h, x, f, g))
    # full-tensor comparison on device (a scalar-mean match would pass
    # for distinct-but-close outputs); bit-identity means max-abs == 0
    max_abs = float(jnp.max(jnp.abs(got - ref)))
    print(f"   max|diff vs A| = {max_abs:.6g}"
          f" ({'bit-identical' if max_abs == 0.0 else 'NOT bit-identical'})",
          flush=True)
