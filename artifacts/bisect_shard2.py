"""Narrow the sharded divergence: which axis (seq vs space), how many
iterations, which scale."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

rng = np.random.default_rng(3)
left = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)


def divergence(iters, spec_kwargs, spec):
    model = PPMStereo(cfg=CFG, iters=iters, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    ref, _ = jax.jit(model.apply)(params, left, right)
    mesh = make_mesh(MeshSpec(**spec_kwargs))
    sh = NamedSharding(mesh, spec)
    rep = NamedSharding(mesh, P())
    fn = jax.jit(model.apply, in_shardings=(
        jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
    out, _ = fn(jax.device_put(params, rep), jax.device_put(left, sh),
                jax.device_put(right, sh))
    return float(np.abs(np.asarray(out) - np.asarray(ref)).max())


for iters in (1, 2):
    for name, kw, spec in (
        ("seq=2", dict(data=1, seq=2, space=1), P(None, "seq", None)),
        ("space=2", dict(data=1, seq=1, space=2), P(None, None, "space")),
        ("seq=2,space=2", dict(data=1, seq=2, space=2), P(None, "seq", "space")),
    ):
        print(f"iters={iters} {name:14s} max diff {divergence(iters, kw, spec):.3e}",
              flush=True)
