"""DynamicStereo model tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppmstereo_tpu.models.dynamic_stereo import DynamicStereo, DynamicStereoConfig

TINY = DynamicStereoConfig(mixed_precision=False)


def _clip(b=1, t=3, h=64, w=128):
    rng = np.random.default_rng(2)
    left = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    return jnp.asarray(left), jnp.asarray(right)


@pytest.mark.slow
def test_eval_and_train_forward():
    left, right = _clip()
    model = DynamicStereo(cfg=TINY, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp = model.apply(params, left, right)
    assert disp.shape == (1, 3, 64, 128, 1)
    assert np.isfinite(np.asarray(disp)).all()

    train_model = DynamicStereo(cfg=TINY, iters=2, test_mode=False)
    preds = train_model.apply(params, left, right)
    assert preds.shape == (4, 1, 3, 64, 128, 1)
    np.testing.assert_allclose(
        np.asarray(preds[-1]), np.asarray(disp), rtol=1e-5, atol=1e-5
    )
