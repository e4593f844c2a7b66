"""StereoAnyVideo + VDA model tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.models.stereoanyvideo import StereoAnyVideo, StereoAnyVideoConfig


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
