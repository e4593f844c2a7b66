"""Candidate fixes for the scan+GSPMD miscompile: (a) full unroll via
nn.scan(unroll=N); (b) carry sharding constraints inside the body."""
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
mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))

def divergence(iters=2, use_mesh_ctx=False):
    model = M.PPMStereo(cfg=CFG, iters=iters, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    ref, _ = jax.jit(model.apply)(params, left, right)
    sh = NamedSharding(mesh, P(None, "seq", "space"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(model.apply, in_shardings=(
        jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
    import contextlib
    ctx = jax.sharding.use_mesh(mesh) if use_mesh_ctx else contextlib.nullcontext()
    with ctx:
        out, _ = fn(jax.device_put(params, rep), jax.device_put(left, sh),
                    jax.device_put(right, sh))
    return float(np.abs(np.asarray(out) - np.asarray(ref)).max())

orig_scan = M.nn.scan

def unroll_scan(body, **kw):
    kw["unroll"] = kw.get("length", 1)
    return orig_scan(body, **kw)

M.nn.scan = unroll_scan
print("scan unroll=N:", f"{divergence():.3e}", flush=True)
M.nn.scan = orig_scan

def constrain(x):
    if hasattr(x, "ndim") and x.ndim == 5:
        return jax.lax.with_sharding_constraint(x, P(None, "seq", "space"))
    return x

def pinned_scan(body, **kw):
    def body2(module, carry, xs):
        carry = jax.tree_util.tree_map(constrain, carry)
        carry, y = body(module, carry, xs)
        carry = jax.tree_util.tree_map(constrain, carry)
        return carry, y
    return orig_scan(body2, **kw)

M.nn.scan = pinned_scan
try:
    print("scan pinned carry:", f"{divergence(use_mesh_ctx=True):.3e}", flush=True)
finally:
    M.nn.scan = orig_scan
