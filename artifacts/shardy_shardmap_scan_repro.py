"""Bisection record: ring (shard_map) play attention inside the scanned
full model miscompiles under Shardy — but NOT in isolation.

Round-5 findings (third member of the Shardy-scan bug family; see
parallel/mesh.py history for the first two), all measured 2026-08-20 on
the 8-device CPU mesh:

  | program                                           | Shardy | GSPMD |
  |---------------------------------------------------|--------|-------|
  | this file: shard_map(ppermute ring) in lax.scan   | exact  | exact |
  | isolated PPMUpdateLoop (nn.scan) + ring           | exact  |  —    |
  | FULL PPMStereo (3-stage cascade, nn.scan) + ring  | 2e-01  | 8e-07 |
  | FULL PPMStereo, unroll_refinement_loop=True + ring| 8e-07  |  —    |

i.e. the trigger needs the full cascade composition — this minimal
scan+shard_map program does NOT reproduce it (kept as the negative
control), and neither honest vma typing (lax.pcast to=varying +
check_vma=True, now shipped in parallel/ring_attention.py) nor carry
sharding pins change the full-model result. Consequence: the ring
engages only with the unrolled loop (numerically identical to the
scan), enforced in models/ppm_stereo.py::_play; the scanned loop uses
the gather path, which is Shardy-exact at every shape >= 64 px.

Second residual boundary (gather path, same date): images BELOW 64 px
(1/16 scale <= 2 rows) keep an O(1e-3) Shardy-vs-sequential residual
in the encoder/SST chains OUTSIDE the refinement loops — bit-identical
across every pin variant tried (loops-only, loops at 2x halo
threshold, whole-model image pin), exact under GSPMD (1.2e-07) and
exact with space sharding off. Not worth more mitigation: no workload
space-shards sub-64px rows (the sharded-config tests use >= 64 px).

Run: python artifacts/shardy_shardmap_scan_repro.py
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
mesh = Mesh(devs, axis_names=("seq", "space"))
N_SPACE = 2

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))


def ring_sum(x):
    """shard_map: ring-accumulate each block's view of the space axis."""
    def local(blk):
        def hop(carry, _):
            val, acc = carry
            acc = acc + jnp.tanh(val)
            val = jax.lax.ppermute(
                val, "space",
                [(i, (i + 1) % N_SPACE) for i in range(N_SPACE)],
            )
            return (val, acc), None

        acc0 = jnp.zeros_like(blk)  # zeros_like inherits blk's vma type
        (blk, acc), _ = jax.lax.scan(hop, (blk, acc0), None, length=N_SPACE)
        return acc

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P("seq", "space", None), out_specs=P("seq", "space", None),
    )(x)


def outer(x, steps=3):
    def body(carry, _):
        y = ring_sum(carry) * 0.5 + carry
        return y, None

    out, _ = jax.lax.scan(body, x, None, length=steps)
    return out


def outer_unrolled(x, steps=3):
    for _ in range(steps):
        x = ring_sum(x) * 0.5 + x
    return x


ref = jax.jit(outer)(x0)  # unsharded (single-device semantics)

sh = NamedSharding(mesh, P("seq", "space", None))
for name, fn in (("scan", outer), ("unrolled", outer_unrolled)):
    for shardy in (True, False):
        jax.config.update("jax_use_shardy_partitioner", shardy)
        with mesh:
            out = jax.jit(fn, in_shardings=(sh,))(jax.device_put(x0, sh))
        err = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
        tag = "ok" if err < 1e-5 else "MISCOMPILE"
        print(f"{name:9s} shardy={shardy}: max|err|={err:.3e}  {tag}",
              flush=True)
jax.config.update("jax_use_shardy_partitioner", True)
