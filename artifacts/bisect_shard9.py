"""Is nn.scan the trigger? Replace it with a plain unrolled loop."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import ppmstereo_tpu.models.ppm_stereo as M
from ppmstereo_tpu.models.ppm_stereo import PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)
rng = np.random.default_rng(3)
left = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))

def divergence(iters=1):
    model = M.PPMStereo(cfg=CFG, iters=iters, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    ref, _ = jax.jit(model.apply)(params, left, right)
    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
    sh = NamedSharding(mesh, P(None, "seq", "space"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(model.apply, in_shardings=(
        jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
    out, _ = fn(jax.device_put(params, rep), jax.device_put(left, sh),
                jax.device_put(right, sh))
    return float(np.abs(np.asarray(out) - np.asarray(ref)).max())

orig_scan = M.nn.scan
def fake_scan(body, variable_broadcast=None, split_rngs=None, length=1, **kw):
    def run(module, carry, xs):
        ys = []
        for _ in range(length):
            carry, y = body(module, carry, None)
            ys.append(y)
        if ys and ys[0] is not None:
            ys = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ys)
        else:
            ys = None
        return carry, ys
    return run

M.nn.scan = fake_scan
print("unrolled loop iters=1:", f"{divergence(1):.3e}", flush=True)
print("unrolled loop iters=2:", f"{divergence(2):.3e}", flush=True)
M.nn.scan = orig_scan
print("lax.scan    iters=1:", f"{divergence(1):.3e}", flush=True)
