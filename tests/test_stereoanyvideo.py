"""StereoAnyVideo + VDA model tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppmstereo_tpu.models.stereoanyvideo import StereoAnyVideo, StereoAnyVideoConfig


@pytest.mark.slow
def test_stereoanyvideo_forward():
    rng = np.random.default_rng(4)
    left = jnp.asarray(rng.uniform(0, 255, (1, 2, 64, 128, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 2, 64, 128, 3)).astype(np.float32))
    model = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp = model.apply(params, left, right)
    assert disp.shape == (1, 2, 64, 128, 1)
    assert np.isfinite(np.asarray(disp)).all()

    train = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=2, test_mode=False)
    preds = train.apply(params, left, right)
    assert preds.shape == (4, 1, 2, 64, 128, 1)
    np.testing.assert_allclose(
        np.asarray(preds[-1]), np.asarray(disp), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_stereoanyvideo_odd_iters_tail():
    """Odd iteration counts run pairs + one unrolled (1,9) tail and stay
    consistent between train and test modes."""
    rng = np.random.default_rng(6)
    left = jnp.asarray(rng.uniform(0, 255, (1, 2, 64, 128, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 2, 64, 128, 3)).astype(np.float32))
    model = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=3, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp = model.apply(params, left, right)
    train = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=3, test_mode=False)
    preds = train.apply(params, left, right)
    # stages run 1 + 1 + 3 iterations
    assert preds.shape == (5, 1, 2, 64, 128, 1)
    np.testing.assert_allclose(
        np.asarray(preds[-1]), np.asarray(disp), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_stereoanyvideo_gradients_reference_iters():
    """Gradient flow at the reference's iters=12 recipe
    (stereoanyvideo.py forward_batch_test default) — only feasible
    because the loop is a scanned, rematerialized pair-chunk body
    instead of a 48-stage Python unroll."""
    from ppmstereo_tpu.train.loss import sequence_loss

    rng = np.random.default_rng(12)
    b, t, h, w = 1, 2, 32, 64
    left = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-8, 0, (b, t, h, w, 1)).astype(np.float32))
    valid = jnp.ones((b, t, h, w), jnp.float32)

    model = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=12, test_mode=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    def loss_fn(p):
        preds = model.apply(p, left, right)
        loss, _ = sequence_loss(preds, gt, valid)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0.0


@pytest.mark.slow
def test_stereoanyvideo_gradients():
    """Training-mode StereoAnyVideo backprops finite, nonzero gradients
    through the AAPC + update loop (frozen VDA depthnet under
    stop_gradient)."""
    from ppmstereo_tpu.train.loss import sequence_loss

    rng = np.random.default_rng(9)
    # H/W must be /32-divisible (the zoo predictor's InputPadder
    # guarantees this in production)
    b, t, h, w = 1, 2, 64, 128
    left = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-8, 0, (b, t, h, w, 1)).astype(np.float32))
    valid = jnp.ones((b, t, h, w), jnp.float32)

    model = StereoAnyVideo(cfg=StereoAnyVideoConfig(), iters=2, test_mode=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    def loss_fn(p):
        preds = model.apply(p, left, right)
        loss, _ = sequence_loss(preds, gt, valid)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    total = 0.0
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        arr = np.asarray(g)
        assert np.isfinite(arr).all(), f"non-finite grad at {path}"
        total += float(np.abs(arr).sum())
    assert total > 0.0
