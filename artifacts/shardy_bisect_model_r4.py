"""Round-4 bisection, level 2: isolated PPMUpdateLoops are Shardy-exact
(shardy_bisect_loop_r4.py) and the unrolled full model is Shardy-exact,
but the scan-based full model diverges. Truncate the forward after each
stage to find where divergence enters.

Run: PYTHONPATH=/root/repo python artifacts/shardy_bisect_model_r4.py
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_use_shardy_partitioner", True)
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.ppm_stereo import (
    PPMStereo, PPMStereoConfig, _resize_video,
)
from ppmstereo_tpu.ops.geometry import avg_pool2d

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)
rng = np.random.default_rng(3)
left = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32))
model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
params = model.init(jax.random.PRNGKey(0), left, right)


def _prep(mdl, image1, image2):
    cfg = mdl.cfg
    dtype = cfg.dtype
    b = image1.shape[0]
    image1 = (2.0 * (image1 / 255.0) - 1.0).astype(dtype)
    image2 = (2.0 * (image2 / 255.0) - 1.0).astype(dtype)
    both = jnp.concatenate([image1, image2], axis=0)
    fmaps = mdl.fnet(both)
    fmap1, fmap2 = fmaps[:b], fmaps[b:]
    hdim = cfg.hidden_dim
    net = jnp.tanh(fmap1[..., :hdim])
    inp = nn.relu(fmap1[..., hdim:])
    return fmap1, fmap2, net, inp


def upto_sst(mdl, image1, image2):
    fmap1, fmap2, net, inp = _prep(mdl, image1, image2)
    f1_16 = avg_pool2d(fmap1, 4, 4)
    f2_16 = avg_pool2d(fmap2, 4, 4)
    f1_16, f2_16 = mdl.sst(f1_16, f2_16)
    return f1_16


def upto_stage16(mdl, image1, image2):
    cfg = mdl.cfg
    b = image1.shape[0]
    fmap1, fmap2, net, inp = _prep(mdl, image1, image2)
    t = fmap1.shape[1]
    h4, w4 = fmap1.shape[2], fmap1.shape[3]
    f1_16 = avg_pool2d(fmap1, 4, 4)
    f2_16 = avg_pool2d(fmap2, 4, 4)
    f1_16, f2_16 = mdl.sst(f1_16, f2_16)
    hdim = cfg.hidden_dim
    net16 = jnp.tanh(f1_16[..., :hdim])
    inp16 = nn.relu(f1_16[..., hdim:])
    flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
    mh16 = mdl.loop16.init_motion_hidden_state(inp16)
    stage_in = mdl._stage_inputs(0, f1_16, f2_16, inp16)
    _, flow_out16, net16, mh16, _, _, _ = mdl.loop16(
        *stage_in, flow16, net16, inp16, mh16
    )
    return flow_out16


def upto_stage8(mdl, image1, image2):
    cfg = mdl.cfg
    b = image1.shape[0]
    fmap1, fmap2, net, inp = _prep(mdl, image1, image2)
    t = fmap1.shape[1]
    h4, w4 = fmap1.shape[2], fmap1.shape[3]
    f1_16 = avg_pool2d(fmap1, 4, 4)
    f2_16 = avg_pool2d(fmap2, 4, 4)
    f1_16, f2_16 = mdl.sst(f1_16, f2_16)
    hdim = cfg.hidden_dim
    net16 = jnp.tanh(f1_16[..., :hdim])
    inp16 = nn.relu(f1_16[..., hdim:])
    f1_8 = (avg_pool2d(fmap1, 2, 2) + _resize_video(f1_16, (h4 // 2, w4 // 2))) / 2.0
    f2_8 = (avg_pool2d(fmap2, 2, 2) + _resize_video(f2_16, (h4 // 2, w4 // 2))) / 2.0
    net8 = jnp.tanh(f1_8[..., :hdim])
    inp8 = nn.relu(f1_8[..., hdim:])
    flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
    mh16 = mdl.loop16.init_motion_hidden_state(inp16)
    stage_in = mdl._stage_inputs(0, f1_16, f2_16, inp16)
    _, flow_out16, net16, mh16, _, _, _ = mdl.loop16(
        *stage_in, flow16, net16, inp16, mh16
    )
    h8, w8 = h4 // 2, w4 // 2
    flow8 = -(h8 / flow_out16.shape[2]) * _resize_video(flow_out16, (h8, w8))
    mh8 = _resize_video(mh16, (h8, w8))
    net8 = (net8 + _resize_video(net16, (h8, w8))) / 2.0
    stage_in = mdl._stage_inputs(1, f1_8, f2_8, inp8)
    _, flow_out8, net8, mh8, _, _, _ = mdl.loop08(
        *stage_in, flow8, net8, inp8, mh8
    )
    return flow_out8


devs = np.asarray(jax.devices()[:4]).reshape(1, 2, 2)
mesh = Mesh(devs, axis_names=("data", "seq", "space"))
sh = NamedSharding(mesh, P(None, "seq", "space"))
rep = NamedSharding(mesh, P())
prep = jax.tree_util.tree_map(lambda _: rep, params)

for name, meth in [("enc+sst", upto_sst), ("stage16", upto_stage16),
                   ("stage8", upto_stage8), ("full", None)]:
    kw = {} if meth is None else {"method": meth}
    ref = jax.jit(lambda p, l, r: model.apply(p, l, r, **kw))(
        params, left, right)
    with mesh:
        fn = jax.jit(
            lambda p, l, r: model.apply(p, l, r, **kw),
            in_shardings=(prep, sh, sh),
        )
        out = fn(jax.device_put(params, rep), jax.device_put(left, sh),
                 jax.device_put(right, sh))
    err = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        out, ref)
    flat = jax.tree_util.tree_leaves(err)
    m = max(flat)
    print(f"{name:10s} max|err| = {m:.3e}  {'ok' if m < 1e-4 else 'DIVERGED'}",
          flush=True)
