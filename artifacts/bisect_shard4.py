"""Monkeypatch bisection: neutralize parts of the PPM step and see which
one removes the seq+space sharded divergence."""
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


print("baseline:", f"{divergence():.3e}", flush=True)

orig_play = M.PPMUpdateLoop._play
def zero_play(self, query_pe, key_aug, value, idx, score_norm):
    return jnp.zeros(query_pe.shape, self.cfg.dtype)
M.PPMUpdateLoop._play = zero_play
print("play->0 :", f"{divergence():.3e}", flush=True)
M.PPMUpdateLoop._play = orig_play

orig_lookup = M.corr_lookup
def zero_lookup(pyramid, coords, radius):
    out = orig_lookup(pyramid, coords, radius)
    return jnp.zeros_like(out)
M.corr_lookup = zero_lookup
print("corr->0 :", f"{divergence():.3e}", flush=True)
M.corr_lookup = orig_lookup

orig_topk = jax.lax.top_k
def fixed_topk(x, k):
    if x.ndim == 3 and k == x.shape[-1]:  # frame_score case: identity order
        idx = jnp.broadcast_to(jnp.arange(k), x.shape[:-1] + (k,))
        return jnp.take_along_axis(x, idx, axis=-1), idx
    return orig_topk(x, k)
M.jax.lax.top_k = fixed_topk
try:
    print("topk->id:", f"{divergence():.3e}", flush=True)
finally:
    M.jax.lax.top_k = orig_topk
