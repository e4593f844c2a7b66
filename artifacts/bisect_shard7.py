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
import ppmstereo_tpu.nn.update as U
import ppmstereo_tpu.nn.gru as G
from ppmstereo_tpu.models.ppm_stereo import PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)
rng = np.random.default_rng(3)
left = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))

def divergence():
    model = M.PPMStereo(cfg=CFG, iters=1, test_mode=True)
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

orig_gru = G.SKSepConvGRU3D.__call__
G.SKSepConvGRU3D.__call__ = lambda self, h, x: h
print("gru->identity (heads live):", f"{divergence():.3e}", flush=True)
G.SKSepConvGRU3D.__call__ = orig_gru

orig_fh = U.FlowHead.__call__
U.FlowHead.__call__ = lambda self, x: jnp.zeros(x.shape[:-1] + (2,), x.dtype)
print("flowhead->0 (gru live)    :", f"{divergence():.3e}", flush=True)
U.FlowHead.__call__ = orig_fh

# mask head -> zeros
orig_call = U.SequenceUpdateBlock3D.__call__
def nomask_call(self, net, inp, motion, motion_global):
    net2, mask, delta = orig_call(self, net, inp, motion, motion_global)
    return net2, jnp.zeros_like(mask), delta
U.SequenceUpdateBlock3D.__call__ = nomask_call
print("mask->0 (gru+flow live)   :", f"{divergence():.3e}", flush=True)
U.SequenceUpdateBlock3D.__call__ = orig_call
