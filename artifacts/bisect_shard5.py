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

# patch update_block __call__: no state change, zero delta/mask
orig_call = U.SequenceUpdateBlock3D.__call__
def frozen_call(self, net, inp, motion, motion_global):
    mask_ch = (27 if self.use_convex_3d else 9) * (self.mask_size ** 2)
    z = jnp.zeros(net.shape[:-1] + (mask_ch,), net.dtype)
    d = jnp.zeros(net.shape[:-1] + (2,), net.dtype)
    return net, z, d
U.SequenceUpdateBlock3D.__call__ = frozen_call
print("gru/heads frozen:", f"{divergence():.3e}", flush=True)
U.SequenceUpdateBlock3D.__call__ = orig_call

# patch get_motion_and_value -> zeros (keeps GRU live but const input)
orig_gmv = U.SequenceUpdateBlock3D.get_motion_and_value
def zero_gmv(self, flow, corr, mh):
    m, h, v = orig_gmv(self, flow, corr, mh)
    return jnp.zeros_like(m), jnp.zeros_like(h), jnp.zeros_like(v)
U.SequenceUpdateBlock3D.get_motion_and_value = zero_gmv
print("motion->0      :", f"{divergence():.3e}", flush=True)
U.SequenceUpdateBlock3D.get_motion_and_value = orig_gmv

# patch uncertainty -> 0.5 const
orig_unc = U.SequenceUpdateBlock3D.get_uncertainty
def const_unc(self, nv):
    return jnp.full(nv.shape[:-1] + (1,), 0.5, nv.dtype)
U.SequenceUpdateBlock3D.get_uncertainty = const_unc
print("uncertainty->c :", f"{divergence():.3e}", flush=True)
U.SequenceUpdateBlock3D.get_uncertainty = orig_unc
