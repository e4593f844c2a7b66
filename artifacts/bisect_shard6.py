"""Minimal repro attempt: GRU / conv3d alone at the real 1/16 shapes
(1,4,4,8,C) under seq=2,space=2 sharding."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from flax import linen as nn
from ppmstereo_tpu.nn.gru import SKSepConvGRU3D
from ppmstereo_tpu.nn.update import SequenceUpdateBlock3D
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
SH = NamedSharding(mesh, P(None, "seq", "space"))
REP = NamedSharding(mesh, P())

def compare(module, *xs, method=None):
    params = module.init(jax.random.PRNGKey(0), *xs)
    kw = {"method": method} if method else {}
    ref = jax.jit(lambda p, *a: module.apply(p, *a, **kw))(params, *xs)
    fn = jax.jit(lambda p, *a: module.apply(p, *a, **kw),
                 in_shardings=(jax.tree_util.tree_map(lambda _: REP, params),)
                 + (SH,) * len(xs))
    out = fn(jax.device_put(params, REP), *[jax.device_put(x, SH) for x in xs])
    err = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)).max()), ref, out)
    return err

rng = np.random.default_rng(0)
for (t, h, w) in ((4, 4, 8), (4, 16, 32)):
    h0 = jnp.asarray(rng.standard_normal((1, t, h, w, 128)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((1, t, h, w, 384)).astype(np.float32))
    print((t, h, w), "GRU:", compare(SKSepConvGRU3D(hidden_dim=128), h0, x0),
          flush=True)

# full update block __call__ at tiny shape
for (t, h, w) in ((4, 4, 8), (4, 16, 32)):
    net = jnp.asarray(rng.standard_normal((1, t, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((1, t, h, w, 128)).astype(np.float32))
    mo = jnp.asarray(rng.standard_normal((1, t, h, w, 128)).astype(np.float32))
    mg = jnp.asarray(rng.standard_normal((1, t, h, w, 128)).astype(np.float32))
    blk = SequenceUpdateBlock3D()
    print((t, h, w), "update block:", compare(blk, net, inp, mo, mg), flush=True)
