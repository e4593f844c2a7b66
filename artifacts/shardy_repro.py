"""Minimal repro of the Shardy partitioner miscompile (JAX 0.9, CPU).

A lax.scan whose body is a single 5-tap SAME convolution returns
O(1)-wrong values when the operand is sharded on TWO mesh axes at once
(here: T on `seq`, H on `space`). Findings (round-3 bisection):

  * plain conv (no scan): exact
  * single-axis sharding (seq only / space only): exact
  * python-loop instead of lax.scan: exact
  * lax.scan(unroll=length) at THIS size: exact (but the full PPMStereo
    model still diverged with unrolled scans — fori_loop/while paths
    also reproduce, see below)
  * lax.fori_loop body: SAME miscompile
  * cost-model dependent: exact at 16/32/64 channels, wrong at 128
  * with_sharding_constraint on the carry does not help
  * classic GSPMD partitioner (jax_use_shardy_partitioner=False): exact

Production consequence (round 3): parallel/mesh.py pinned classic GSPMD
for multi-axis meshes; PPMStereoConfig.unroll_refinement_loop=True was
the Shardy-exact formulation.

ROUND-4 RESOLUTION (artifacts/shardy_probe_r4.py + shardy_bisect_loop_r4
.py): lowering the conv as explicit jnp.pad + VALID partitions THIS
repro exactly under Shardy — nn/common.py::Conv now always lowers that
way, and the full scan-based model is Shardy-exact at every adequate
shape. One residual trigger remains upstream: CHAINED convs in a scan
body when a space shard of the operand is not larger than one conv's
halo (e.g. 2 local rows vs a 7x7 conv's halo 3) — make_mesh falls back
to classic GSPMD only inside that region (shardy_safe_shapes).

Run: python artifacts/shardy_repro.py  (needs >=4 CPU devices)
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

rng = np.random.default_rng(0)
devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
mesh = Mesh(devs, axis_names=("seq", "space"))
sh = NamedSharding(mesh, P(None, "seq", "space"))
rep = NamedSharding(mesh, P())

T, H, W, C = 4, 4, 32, 128  # C=16 does NOT reproduce; C=128 does
x = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
w = jnp.asarray((rng.standard_normal((1, 5, 1, C, C)) * 0.05).astype(np.float32))


def f(x, w):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        return y, None

    out, _ = jax.lax.scan(body, x, None, length=2)
    return out


ref = jax.jit(f)(x, w)
out = jax.jit(f, in_shardings=(sh, rep))(
    jax.device_put(x, sh), jax.device_put(w, rep))
err = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
print(f"max abs err sharded-vs-single: {err:.3e}  "
      f"({'MISCOMPILE' if err > 1e-3 else 'ok'})")
