"""Shared tiny-model builders for the 2-process distributed test: the
worker processes and the single-process golden run must construct the
IDENTICAL computation (same seeds, same config, same data)."""

from __future__ import annotations

import numpy as np

GLOBAL_BATCH = 8
T, H, W = 2, 32, 64


def _tiny_cfg():
    from ppmstereo_tpu.models.ppm_stereo import PPMStereoConfig

    return PPMStereoConfig(
        mixed_precision=False, use_cnet=False, attention_type=None,
        num_frames=T, top_k=T, force_xla_attention=True,
    )


def build_train_setup():
    """(model, replicated-init state, global numpy batch)."""
    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo
    from ppmstereo_tpu.train.state import create_train_state

    model = PPMStereo(cfg=_tiny_cfg(), iters=1, test_mode=False)
    zeros = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    state = create_train_state(model, params, num_steps=100)

    rng = np.random.default_rng(7)
    batch = {
        "left": rng.uniform(0, 255, (GLOBAL_BATCH, T, H, W, 3)).astype(np.float32),
        "right": rng.uniform(0, 255, (GLOBAL_BATCH, T, H, W, 3)).astype(np.float32),
        "disparity": rng.uniform(0, 8, (GLOBAL_BATCH, T, H, W, 1)).astype(np.float32),
        "valid": np.ones((GLOBAL_BATCH, T, H, W), np.float32),
    }
    return model, state, batch


def build_parallel_window_setup(mesh=None):
    """(window_fn, video) for ParallelWindowPredictor parity: a tiny
    batched PPMStereo window function + a deterministic 10-frame video
    (stride-1 windows -> batched full windows AND an odd tail window).
    With a mesh, params are mesh-replicated so the window_fn's captures
    are valid in multi-process jits."""
    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo

    model = PPMStereo(cfg=_tiny_cfg(), iters=1, test_mode=True)
    zeros = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), zeros, zeros)
    if mesh is not None:
        from ppmstereo_tpu.parallel.sharding import replicate

        params = jax.device_put(params, replicate(mesh))

    def window_fn(left, right):
        return model.apply(params, left, right)

    rng = np.random.default_rng(11)
    video = rng.uniform(0, 255, (10, 2, H, W, 3)).astype(np.float32)
    return window_fn, video


COMPOSED_KERNEL = 4
COMPOSED_FRAMES = 100
# 64px: the smallest image class proven Shardy-exact with seq x space
# sharding (models/ppm_stereo.py::_tiny_row_shards covers the 1/16
# stage; sub-64px images leave 1/16 scales of <= 2 rows whose
# encoder/SST chains still hit a residual O(1e-3) Shardy inexactness —
# boundary documented in artifacts/shardy_shardmap_scan_repro.py and
# parallel/mesh.py; nothing real shards sub-64px rows over devices)
COMPOSED_H, COMPOSED_W = 64, 64


def build_composed_window_setup(mesh=None):
    """(window_fn, video) for the FULLY-COMPOSED BASELINE config #5
    check: a 100-frame video whose windows pipeline over `data` while
    EACH window also shards frames over `seq` and rows over `space`
    (kernel 4 -> stride 2, t=4 over seq=2, h over space=2)."""
    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

    cfg = PPMStereoConfig(
        mixed_precision=False, use_cnet=False, attention_type=None,
        num_frames=COMPOSED_KERNEL, top_k=2, force_xla_attention=True,
    )
    model = PPMStereo(cfg=cfg, iters=1, test_mode=True)
    zeros = jnp.zeros((1, COMPOSED_KERNEL, COMPOSED_H, COMPOSED_W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(5), zeros, zeros)
    if mesh is not None:
        from ppmstereo_tpu.parallel.sharding import replicate

        params = jax.device_put(params, replicate(mesh))

    def window_fn(left, right):
        return model.apply(params, left, right)

    rng = np.random.default_rng(23)
    video = rng.uniform(
        0, 255, (COMPOSED_FRAMES, 2, COMPOSED_H, COMPOSED_W, 3)
    ).astype(np.float32)
    return window_fn, video


def build_eval_predictor_and_dataset():
    from ppmstereo_tpu.data.datasets import SyntheticStereoDataset
    from ppmstereo_tpu.models.zoo import model_zoo

    predictor = model_zoo(
        "PPMStereoModel", kernel_size=T, iters=1,
        mixed_precision=False, use_cnet=False, attention_type=None,
        num_frames=T, top_k=T, force_xla_attention=True,
    )
    dataset = SyntheticStereoDataset(num_seqs=4, sample_len=T, height=H, width=W)
    return predictor, dataset
