"""Round-4 probe: which reformulations of the scan+conv body compile
correctly under Shardy with 2-axis sharding?  (See shardy_repro.py.)

Variants:
  base       — SAME conv in scan body (known MISCOMPILE)
  pairs      — explicit [(2,2)] padding pairs instead of "SAME"
  padvalid   — jnp.pad + VALID conv
  outcon     — with_sharding_constraint on conv output inside body
  incon      — with_sharding_constraint on conv input inside body
  shmap_conv — the conv wrapped in shard_map w/ explicit halo exchange
  shmap_scan — the WHOLE scan wrapped in shard_map w/ halo per step
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_use_shardy_partitioner", True)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

rng = np.random.default_rng(0)
devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
mesh = Mesh(devs, axis_names=("seq", "space"))
sh = NamedSharding(mesh, P(None, "seq", "space"))
rep = NamedSharding(mesh, P())

T, H, W, C = 4, 4, 32, 128
x = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
w = jnp.asarray((rng.standard_normal((1, 5, 1, C, C)) * 0.05).astype(np.float32))
DN = ("NTHWC", "THWIO", "NTHWC")


def conv_same(c, w):
    return jax.lax.conv_general_dilated(
        c, w, window_strides=(1, 1, 1), padding="SAME", dimension_numbers=DN)


def scan2(body, x):
    out, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None, length=2)
    return out


def f_base(x, w):
    return scan2(lambda c: conv_same(c, w), x)


def f_pairs(x, w):
    return scan2(lambda c: jax.lax.conv_general_dilated(
        c, w, window_strides=(1, 1, 1), padding=[(0, 0), (2, 2), (0, 0)],
        dimension_numbers=DN), x)


def f_padvalid(x, w):
    def body(c):
        cp = jnp.pad(c, ((0, 0), (0, 0), (2, 2), (0, 0), (0, 0)))
        return jax.lax.conv_general_dilated(
            cp, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=DN)
    return scan2(body, x)


def f_outcon(x, w):
    def body(c):
        y = conv_same(c, w)
        return jax.lax.with_sharding_constraint(y, sh)
    return scan2(body, x)


def f_incon(x, w):
    def body(c):
        c = jax.lax.with_sharding_constraint(c, sh)
        return conv_same(c, w)
    return scan2(body, x)


def _halo_conv_local(c, w):
    # c is the LOCAL (1, T/2, H/2, W, C) block; halo 2 rows over space
    up = jax.lax.ppermute(c[:, :, -2:], "space", [(0, 1)])
    dn = jax.lax.ppermute(c[:, :, :2], "space", [(1, 0)])
    cp = jnp.concatenate([up, c, dn], axis=2)
    return jax.lax.conv_general_dilated(
        cp, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=DN)


def f_shmap_conv(x, w):
    hc = shard_map(
        _halo_conv_local, mesh=mesh, in_specs=(P(None, "seq", "space"), P()),
        out_specs=P(None, "seq", "space"))
    return scan2(lambda c: hc(c, w), x)


def f_shmap_scan(x, w):
    def local(c, w):
        return scan2(lambda cc: _halo_conv_local(cc, w), c)
    return shard_map(
        local, mesh=mesh, in_specs=(P(None, "seq", "space"), P()),
        out_specs=P(None, "seq", "space"))(x, w)


ref = jax.jit(f_base)(x, w)
for name, f in [("base", f_base), ("pairs", f_pairs),
                ("padvalid", f_padvalid), ("outcon", f_outcon),
                ("incon", f_incon), ("shmap_conv", f_shmap_conv),
                ("shmap_scan", f_shmap_scan)]:
    try:
        out = jax.jit(f, in_shardings=(sh, rep))(
            jax.device_put(x, sh), jax.device_put(w, rep))
        err = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
        print(f"{name:12s} max|err| = {err:.3e}  "
              f"{'MISCOMPILE' if err > 1e-3 else 'ok'}")
    except Exception as e:
        print(f"{name:12s} ERROR: {str(e).splitlines()[0][:100]}")
