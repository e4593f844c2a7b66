"""BiDAStereo + RAFT model tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig
from ppmstereo_tpu.models.raft import RAFT, RAFTConfig


def _clip(b=1, t=2, h=64, w=128, seed=3):
    rng = np.random.default_rng(seed)
    left = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    return jnp.asarray(left), jnp.asarray(right)


def test_raft_forward():
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    model = RAFT(cfg=RAFTConfig(), iters=2)
    params = model.init(jax.random.PRNGKey(0), i1, i2)
    flow_low, flow_up = model.apply(params, i1, i2)
    assert flow_low.shape == (1, 8, 12, 2)
    assert flow_up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


@pytest.mark.slow
def test_bidastereo_forward():
    left, right = _clip(t=2)
    model = BiDAStereo(cfg=BiDAStereoConfig(raft_iters=2), iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp = model.apply(params, left, right)
    assert disp.shape == (1, 2, 64, 128, 1)
    assert np.isfinite(np.asarray(disp)).all()

    train = BiDAStereo(cfg=BiDAStereoConfig(raft_iters=2), iters=2, test_mode=False)
    preds = train.apply(params, left, right)
    assert preds.shape == (4, 1, 2, 64, 128, 1)
    np.testing.assert_allclose(
        np.asarray(preds[-1]), np.asarray(disp), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_bidastereo_gradients():
    """Training-mode BiDAStereo backprops finite, nonzero gradients
    through the update loop (the frozen RAFT flow provider sits under
    stop_gradient and must receive zero gradient)."""
    import numpy as np
    from ppmstereo_tpu.train.loss import sequence_loss

    rng = np.random.default_rng(7)
    b, t, h, w = 1, 2, 48, 64
    left = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-8, 0, (b, t, h, w, 1)).astype(np.float32))
    valid = jnp.ones((b, t, h, w), jnp.float32)

    model = BiDAStereo(cfg=BiDAStereoConfig(mixed_precision=False, raft_iters=2),
                       iters=2, test_mode=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    def loss_fn(p):
        preds = model.apply(p, left, right)
        loss, _ = sequence_loss(preds, gt, valid)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    total = 0.0
    for path, g in leaves:
        arr = np.asarray(g)
        assert np.isfinite(arr).all(), f"non-finite grad at {path}"
        total += float(np.abs(arr).sum())
    assert total > 0.0
