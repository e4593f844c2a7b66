"""End-to-end shape/sanity tests for the PPMStereo flax model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

TINY = PPMStereoConfig(
    mixed_precision=False,
    use_cnet=False,
    top_k=2,
    force_xla_attention=True,
)


def _clip(b=1, t=3, h=64, w=128):
    rng = np.random.default_rng(1)
    left = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (b, t, h, w, 3)).astype(np.float32)
    return jnp.asarray(left), jnp.asarray(right)


class TestPPMForward:
    @pytest.mark.slow
    def test_eval_forward_shapes(self):
        left, right = _clip()
        model = PPMStereo(cfg=TINY, iters=2, test_mode=True)
        params = model.init(jax.random.PRNGKey(0), left, right)
        disp, unc = model.apply(params, left, right)
        assert disp.shape == (1, 3, 64, 128, 1)
        assert unc.shape == (1, 3, 64, 128, 1)
        assert np.isfinite(np.asarray(disp)).all()
        assert np.isfinite(np.asarray(unc)).all()
        assert (np.asarray(unc) >= 0).all() and (np.asarray(unc) <= 1).all()

    def test_train_forward_collects_all_iterations(self):
        left, right = _clip()
        model = PPMStereo(cfg=TINY, iters=2, test_mode=False)
        params = model.init(jax.random.PRNGKey(0), left, right)
        preds, uncs = model.apply(params, left, right)
        # iters//2 + iters//2 + iters = 1 + 1 + 2
        assert preds.shape == (4, 1, 3, 64, 128, 1)
        assert uncs.shape == (4, 1, 3, 64, 128, 1)
        assert np.isfinite(np.asarray(preds)).all()

    def test_eval_matches_train_last_iteration(self):
        """The stage-final upsample (eval path) must equal the last
        collected training prediction."""
        left, right = _clip()
        train_model = PPMStereo(cfg=TINY, iters=2, test_mode=False)
        params = train_model.init(jax.random.PRNGKey(0), left, right)
        preds, uncs = train_model.apply(params, left, right)

        eval_model = PPMStereo(cfg=TINY, iters=2, test_mode=True)
        disp, unc = eval_model.apply(params, left, right)
        np.testing.assert_allclose(
            np.asarray(disp), np.asarray(preds[-1]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(unc), np.asarray(uncs[-1]), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.slow
    def test_grads_flow(self):
        left, right = _clip(t=3, h=32, w=128)
        model = PPMStereo(cfg=TINY, iters=2, test_mode=False)
        params = model.init(jax.random.PRNGKey(0), left, right)

        def loss_fn(p):
            preds, _ = model.apply(p, left, right)
            return jnp.mean(jnp.abs(preds))

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # at least some gradient mass reaches the encoder
        gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert gnorm > 0


@pytest.mark.slow
def test_ppm_vda_variant():
    """PPMStereo_VDA: VFM-fused multilevel encoder path."""
    cfg = PPMStereoConfig(
        mixed_precision=False, use_cnet=False, top_k=2,
        force_xla_attention=True, use_vfm=True,
    )
    left, right = _clip(t=2, h=64, w=128)
    model = PPMStereo(cfg=cfg, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp, unc = model.apply(params, left, right)
    assert disp.shape == (1, 2, 64, 128, 1)
    assert np.isfinite(np.asarray(disp)).all()


def test_chunk_sizes_balanced():
    from ppmstereo_tpu.models.ppm_stereo import _chunk_sizes

    assert _chunk_sizes(20, 19) == [10, 10]
    assert _chunk_sizes(7, 3) == [3, 2, 2]
    assert _chunk_sizes(10, 4) == [4, 3, 3]
    assert _chunk_sizes(5, 5) == [5]
    assert _chunk_sizes(5, 1) == [1, 1, 1, 1, 1]
    for t in range(1, 40):
        for r in range(1, 25):
            sizes = _chunk_sizes(t, r)
            assert sum(sizes) == t and max(sizes) <= r
            assert max(sizes) - min(sizes) <= 1


@pytest.mark.slow
def test_play_chunked_matches_unchunked(monkeypatch):
    """Forcing the target-axis chunking in _play (production: 720p k20)
    must be numerically identical to the single-batch path; chunk-size
    balance itself is unit-tested in test_chunk_sizes_balanced."""
    import ppmstereo_tpu.models.ppm_stereo as ppm

    left, right = _clip(t=4)
    model = PPMStereo(cfg=TINY, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    ref = model.apply(params, left, right)

    # bank at 1/4 of 64x128 with t=4,k=2,2c: 4*2*16*32*256 = 1,048,576
    # elements; budget below that forces >=2 chunks at every scale
    monkeypatch.setattr(ppm, "_PLAY_CHUNK_BUDGET_CACHE", 600_000)
    got = model.apply(params, left, right)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5
    )


def test_play_chunk_budget_scales_with_hbm(monkeypatch):
    """The chunk budget derives from the local device's HBM (VERDICT r3
    item 7): a 16 GiB and a 32 GiB budget must chunk the 720p/k20
    production bank DIFFERENTLY (the fixed v5e constant under-chunked
    nothing on larger parts and OOMed smaller ones)."""
    import ppmstereo_tpu.models.ppm_stereo as ppm

    # env override wins and resets per-test via the cache
    monkeypatch.setattr(ppm, "_PLAY_CHUNK_BUDGET_CACHE", None)
    monkeypatch.setenv("PPM_CHUNK_BUDGET_ELEMS", "1.5e9")
    b16 = ppm._play_chunk_budget()
    monkeypatch.setattr(ppm, "_PLAY_CHUNK_BUDGET_CACHE", None)
    monkeypatch.setenv("PPM_CHUNK_BUDGET_ELEMS", "3e9")
    b32 = ppm._play_chunk_budget()
    assert b32 == 2 * b16

    # 720p/k20 1/4-scale pick: b=1, t=20, k=5, h=184, w=320, 2 tensors,
    # c=128 -> 1.507e9 elements: 2 chunks at the 16 GiB budget, 1 at 32
    b, t, k, h, w, c = 1, 20, 5, 184, 320, 128
    per_row = b * k * h * w * 2 * c
    n16 = len(ppm._chunk_sizes(t, max(1, b16 // per_row)))
    n32 = len(ppm._chunk_sizes(t, max(1, b32 // per_row)))
    assert n16 == 2 and n32 == 1

    # device-kind table fallback resolves on whatever backend runs the
    # suite without raising, and returns a positive budget
    monkeypatch.setattr(ppm, "_PLAY_CHUNK_BUDGET_CACHE", None)
    monkeypatch.delenv("PPM_CHUNK_BUDGET_ELEMS", raising=False)
    assert ppm._play_chunk_budget() > 0
