"""Where does the error live spatially? Dump per-(t,h,w) diff pattern of
the final disparity and the stage-16 net intermediate."""
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
model = M.PPMStereo(cfg=CFG, iters=1, test_mode=True)
params = model.init(jax.random.PRNGKey(0), left, right)

def apply_cap(p, l, r):
    out, mods = model.apply(p, l, r, capture_intermediates=True)
    return out, mods["intermediates"]

ref_out, ref_i = jax.jit(apply_cap)(params, left, right)
mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
sh = NamedSharding(mesh, P(None, "seq", "space"))
rep = NamedSharding(mesh, P())
fn = jax.jit(apply_cap, in_shardings=(
    jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
sh_out, sh_i = fn(jax.device_put(params, rep), jax.device_put(left, sh),
                  jax.device_put(right, sh))

a = np.asarray(ref_i["update_block16"]["__call__"][0][2], np.float64)
b = np.asarray(sh_i["update_block16"]["__call__"][0][2], np.float64)
d = np.abs(a - b).max(axis=(0, 4))  # (T, H, W)
print("stage16 net diff by frame:", d.max(axis=(1, 2)))
print("stage16 net diff by row:", np.round(d.max(axis=(0, 2)), 4))
print("stage16 net diff by col:", np.round(d.max(axis=(0, 1)), 4))
# flow at stage 16
a = np.asarray(ref_i["update_block16"]["__call__"][0][0], np.float64)
b = np.asarray(sh_i["update_block16"]["__call__"][0][0], np.float64)
d = np.abs(a - b).max(axis=(0, 4))
print("stage16 flow diff by frame:", d.max(axis=(1, 2)))
print("stage16 flow diff by row:", np.round(d.max(axis=(0, 2)), 4))
print("stage16 flow diff by col:", np.round(d.max(axis=(0, 1)), 4))
