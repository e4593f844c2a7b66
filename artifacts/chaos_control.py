"""Control: feed the SINGLE-DEVICE model inputs perturbed at fp32
reduction-noise scale (~1e-6 relative) and measure output divergence.
If it matches the sharded-run divergence, the seq/space gap is chaotic
amplification of benign reorder noise, not a sharding bug."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)

rng = np.random.default_rng(3)
left = rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32)
right = rng.uniform(0, 255, (1, 4, 64, 128, 3)).astype(np.float32)

model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
params = model.init(jax.random.PRNGKey(0), jnp.asarray(left), jnp.asarray(right))
f = jax.jit(model.apply)

d0, _ = f(params, jnp.asarray(left), jnp.asarray(right))
for eps_rel in (1e-7, 1e-6, 1e-5):
    eps = eps_rel * 255.0
    dl = (left + rng.normal(0, eps, left.shape)).astype(np.float32)
    dr = (right + rng.normal(0, eps, right.shape)).astype(np.float32)
    d1, _ = f(params, jnp.asarray(dl), jnp.asarray(dr))
    diff = np.abs(np.asarray(d0) - np.asarray(d1))
    corr = np.corrcoef(np.asarray(d0).ravel(), np.asarray(d1).ravel())[0, 1]
    print(f"input rel-noise {eps_rel:.0e}: out max diff {diff.max():.3e} "
          f"mean {diff.mean():.3e} corr {corr:.6f}")

# sanity: a different input must change the output
other = rng.uniform(0, 255, left.shape).astype(np.float32)
d2, _ = f(params, jnp.asarray(other), jnp.asarray(right))
print("different-input max diff:", float(np.abs(np.asarray(d0) - np.asarray(d2)).max()))
# and param perturbation at reduction-noise scale
pert = jax.tree_util.tree_map(
    lambda p: p * (1 + 1e-6 * np.random.default_rng(1).standard_normal(p.shape)
                   ).astype(p.dtype), params)
d3, _ = f(pert, jnp.asarray(left), jnp.asarray(right))
print("param 1e-6 rel-noise max diff:", float(np.abs(np.asarray(d0) - np.asarray(d3)).max()))
