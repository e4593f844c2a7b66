"""Bisect the seq/space-sharded forward divergence: capture every module
intermediate in both the single-device and sharded runs and report the
first place the relative error jumps."""
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

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)

rng = np.random.default_rng(3)
left = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))

model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
params = model.init(jax.random.PRNGKey(0), left, right)


def apply_cap(p, l, r):
    out, mods = model.apply(p, l, r, capture_intermediates=True)
    return out, mods["intermediates"]


ref_out, ref_inter = jax.jit(apply_cap)(params, left, right)

mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
sh = NamedSharding(mesh, P(None, "seq", "space"))
rep = NamedSharding(mesh, P())
fn = jax.jit(apply_cap, in_shardings=(
    jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
sh_out, sh_inter = fn(jax.device_put(params, rep),
                      jax.device_put(left, sh), jax.device_put(right, sh))

flat_ref = jax.tree_util.tree_flatten_with_path(ref_inter)[0]
flat_sh = dict(jax.tree_util.tree_flatten_with_path(sh_inter)[0])

rows = []
for path, a in flat_ref:
    b = flat_sh.get(path)
    if b is None or not hasattr(a, "shape") or a.shape != b.shape:
        continue
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.abs(a).max() + 1e-8
    rel = np.abs(a - b).max() / denom
    name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
    rows.append((rel, name, a.shape))

rows.sort(key=lambda r: -r[0])
print("== worst intermediates (rel err, name, shape) ==")
for rel, name, shape in rows[:30]:
    print(f"{rel:10.2e}  {name}  {shape}")

d = np.abs(np.asarray(ref_out[0]) - np.asarray(sh_out[0]))
print("final disp max abs diff:", d.max())
