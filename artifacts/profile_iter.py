"""Per-component timing of ONE 1/4-scale PPM iteration (short config).

Each component runs N times inside a jitted fori_loop with a forced data
dependency (input perturbed by the carry), so per-call tunnel overhead
(~35 ms) is amortized away. Shapes: b=1, t=10, 80x128, c=128, bf16.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.geometry import coords_grid_x
from ppmstereo_tpu.ops.upsample import convex_upsample_3d

B = 1
T = int(os.environ.get("T", "10"))
H = int(os.environ.get("H", "80"))
W = int(os.environ.get("W", "128"))
C = 128
N = int(os.environ.get("N", "20"))
cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
model = PPMStereo(cfg=cfg, iters=10, test_mode=True)

rng = np.random.default_rng(0)
f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
bf = lambda *s: f32(*s).astype(cfg.dtype)

left = jnp.asarray(rng.uniform(0, 255, (B, T, 320, 512, 3)).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), left, left)
print("init done", flush=True)

fmap1, fmap2 = bf(B * T, H, W, 256), bf(B * T, H, W, 256)
pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)
coords0 = coords_grid_x(B * T, H, W)
flow = f32(B, T, H, W, 2) * 2
net, inp = bf(B, T, H, W, C), bf(B, T, H, W, C)
mh = bf(B, T, H, W, 64)
corrs = bf(B, T, H, W, 36)
motion = bf(B, T, H, W, C)
motion_g = bf(B, T, H, W, C)
query_pe, key_aug, value = bf(B, T, H, W, C), bf(B, T, H, W, 2 * C), bf(B, T, H, W, C)
idx = jnp.tile(jnp.arange(5, dtype=jnp.int32)[None, None], (B, T, 1))
score_norm = jnp.ones((B, T, 5), jnp.float32)
mask = bf(B, T, H, W, 27 * 16)


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).mean())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(jfn(*args)).mean())
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)/N*1e3:8.2f} ms/iter", flush=True)
    return min(ts) / N


def amortize(fn):
    """Run fn N times with a carried perturbation to defeat hoisting."""

    def run(*args):
        def body(i, acc):
            eps = acc * 1e-30
            out = fn(*[a + eps.astype(a.dtype) for a in args])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    return run


ub = lambda m: m.loop04.update_block

# 1. corr lookup
timeit(
    "corr lookup (4 lvl, 9 tap)",
    amortize(
        lambda fl: corr_lookup(pyramid, coords0 + fl[..., 0].reshape(B * T, H, W), 4)
    ),
    flow,
)

# 2. motion encoder
timeit(
    "motion encoder (get_motion_and_value)",
    amortize(
        lambda c, m_: model.apply(
            params, c, m_,
            method=lambda m, c, m_: ub(m).get_motion_and_value(
                flow.astype(cfg.dtype), c, m_
            )[0],
        )
    ),
    corrs, mh,
)

# 3. uncertainty head + QAM
timeit(
    "uncertainty head",
    amortize(
        lambda n_, v_: model.apply(
            params, n_, v_,
            method=lambda m, n_, v_: ub(m).get_uncertainty(
                jnp.concatenate([n_, v_], axis=-1)
            ),
        )
    ),
    net, value,
)

# 4. play (gather + flash attention)
timeit(
    "play (gather+attention)",
    amortize(
        lambda q, k, v: model.apply(
            params, q, k, v,
            method=lambda m, q, k, v: m.loop04._play(q, k, v, idx, score_norm),
        )
    ),
    query_pe, key_aug, value,
)

# 5. full GRU block call (attn + gru + heads)
timeit(
    "update block call (attn+GRU+heads)",
    amortize(
        lambda n_, x_, mo, mg: model.apply(
            params, n_, x_, mo, mg,
            method=lambda m, n_, x_, mo, mg: ub(m)(n_, x_, mo, mg)[0],
        )
    ),
    net, inp, motion, motion_g,
)

# 5a. GRU alone
timeit(
    "  gru alone (SKSepConvGRU3D)",
    amortize(
        lambda n_, x_: model.apply(
            params, n_, x_,
            method=lambda m, n_, x_: ub(m).gru(
                n_, jnp.concatenate([x_, x_, x_], axis=-1)
            ),
        )
    ),
    net, inp,
)

# 5b. flow + mask heads alone
timeit(
    "  flow+mask heads alone",
    amortize(
        lambda n_: model.apply(
            params, n_,
            method=lambda m, n_: ub(m).flow_head(n_)
            + 0.0 * ub(m).mask_conv2(jax.nn.relu(ub(m).mask_conv1(n_)))[..., :2],
        )
    ),
    net,
)

# 6. stage-final convex upsample (once per stage, not per iter)
timeit(
    "convex upsample 3d (once/stage)",
    amortize(lambda f, ma: convex_upsample_3d(f, ma, rate=4)[..., :1]),
    flow, mask,
)
