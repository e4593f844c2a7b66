"""Segment-timing profile of one short-config window forward on the TPU.

Times (device-side, value-fetch synced — block_until_ready is unreliable
over the axon tunnel) each major segment of the PPMStereo window forward
at the bench `short` operating point (320x512, T=10, iters=10, bf16):

  fnet / cnet / SST / per-stage PPM loops / full forward

so optimization effort goes where the time actually is.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.ops.geometry import avg_pool2d

H, W, T, ITERS, REPS = 320, 512, 10, 10, 3
cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
model = PPMStereo(cfg=cfg, iters=ITERS, test_mode=True)

rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
print("init done", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "mean")]
    float(leaves[0].mean())
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "mean")]
        for l in leaves:
            float(l.mean())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:28s} {best*1e3:9.1f} ms", flush=True)
    return best


dtype = cfg.dtype
img = (2.0 * (left / 255.0) - 1.0).astype(dtype)
both = jnp.concatenate([img, img], axis=0)

# --- encoders
fnet = jax.jit(lambda p, x: model.apply(p, x, method=lambda m, x: m.fnet(x)))
t_fnet = timeit("fnet (both L+R)", fnet, params, both)

cnet = jax.jit(lambda p, x: model.apply(p, x, method=lambda m, x: m.cnet(x)))
t_cnet = timeit("cnet (ConvNeXt, L only)", cnet, params, img)

# --- SST at 1/16
fm = fnet(params, both)
f1_16 = avg_pool2d(fm[:1], 4, 4)
f2_16 = avg_pool2d(fm[1:], 4, 4)
sst = jax.jit(lambda p, a, b: model.apply(p, a, b, method=lambda m, a, b: m.sst(a, b)))
t_sst = timeit("SST (1/16)", sst, params, f1_16, f2_16)


# --- stage loops (with realistic shapes, zero-ish inputs)
def run_stage(m, stage, f1, f2, iters_loop):
    cfgl = m.cfg
    b, t, h, w, _ = f1.shape
    hdim = cfgl.hidden_dim
    net = jnp.tanh(f1[..., :hdim])
    inp = jax.nn.relu(f1[..., hdim:])
    flow = jnp.zeros((b, t, h, w, 2), jnp.float32)
    loop = [m.loop16, m.loop08, m.loop04][stage]
    # mh params only exist under loop16 (later stages resize the carried
    # state in the real forward)
    mh = m.loop16.init_motion_hidden_state(inp)
    stage_in = m._stage_inputs(stage, f1, f2, inp)
    return loop(*stage_in, flow, net, inp, mh)[1]


fm1, fm2 = fm[:1], fm[1:]
f1_8 = avg_pool2d(fm1, 2, 2)
f2_8 = avg_pool2d(fm2, 2, 2)

stage16 = jax.jit(
    lambda p, a, b: model.apply(p, a, b, method=lambda m, a, b: run_stage(m, 0, a, b, None))
)
t_s16 = timeit(f"stage 1/16 loop ({max(ITERS//2,1)} it)", stage16, params, f1_16, f2_16)

stage8 = jax.jit(
    lambda p, a, b: model.apply(p, a, b, method=lambda m, a, b: run_stage(m, 1, a, b, None))
)
t_s8 = timeit(f"stage 1/8 loop ({max(ITERS//2,1)} it)", stage8, params, f1_8, f2_8)

stage4 = jax.jit(
    lambda p, a, b: model.apply(p, a, b, method=lambda m, a, b: run_stage(m, 2, a, b, None))
)
t_s4 = timeit(f"stage 1/4 loop ({ITERS} it)", stage4, params, fm1, fm2)

# --- full forward
fwd = jax.jit(model.apply)
t_full = timeit("FULL window forward", fwd, params, left, right)

acct = t_fnet + t_cnet + t_sst + t_s16 + t_s8 + t_s4
print(f"\nsum of segments: {acct*1e3:.1f} ms vs full {t_full*1e3:.1f} ms "
      f"(residual {max(t_full-acct,0)*1e3:.1f} ms: resizes/upsample/glue)")
