"""Train-step speed vs remat policy (one v5e chip).

Current: full per-iteration remat (everything recomputed on backward).
Candidate: jax.checkpoint policy dots_with_no_batch_dims_saveable —
keeps matmul/conv outputs (the expensive recomputes) and recomputes only
cheap elementwise, at higher activation memory.

Run AFTER the bench measurements (each variant is a fresh ~10-20 min
remote compile).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ppmstereo_tpu.models.ppm_stereo as M
from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.train.loss import sequence_loss

B = int(os.environ.get("TRAIN_B", "1"))
T, H, W, ITERS = 5, 320, 512, 10
MODE = os.environ.get("REMAT_MODE", "full")  # full | dots | none


_orig_remat = M.nn.remat


def patched_remat(step, prevent_cse=False):
    if MODE == "dots":
        return _orig_remat(
            step, prevent_cse=prevent_cse,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    return _orig_remat(step, prevent_cse=prevent_cse)


if MODE == "dots":
    M.nn.remat = patched_remat

cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True, num_frames=T,
                      remat=(MODE != "none"))
model = PPMStereo(cfg=cfg, iters=ITERS, test_mode=False)

rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (B, T, H, W, 3)).astype(np.float32))
right = jnp.asarray(rng.uniform(0, 255, (B, T, H, W, 3)).astype(np.float32))
gt = jnp.asarray(rng.uniform(0, 64, (B, T, H, W, 1)).astype(np.float32))
valid = jnp.ones((B, T, H, W), jnp.float32)

t0 = time.perf_counter()
params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
jax.tree_util.tree_map(lambda x: x.block_until_ready(), params)
print(f"[{MODE}] init {time.perf_counter()-t0:.1f}s", flush=True)


def loss_fn(p):
    preds, uncs = model.apply(p, left, right)
    loss, _ = sequence_loss(preds, gt, valid, uncertainties=uncs)
    return loss


grad_fn = jax.jit(jax.value_and_grad(loss_fn))
t0 = time.perf_counter()
loss, grads = grad_fn(params)
_ = float(loss)
print(f"[{MODE}] first step (compile+run) {time.perf_counter()-t0:.1f}s "
      f"loss={float(loss):.3f}", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    loss, grads = grad_fn(params)
    _ = float(loss) + float(jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum(), grads, 0.0))
    print(f"[{MODE}] rep{rep}: {time.perf_counter()-t0:.2f}s", flush=True)
