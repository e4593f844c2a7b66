"""Multi-chip strict-parity inference: ONE window sharded over the mesh.

The reference's 720p/k20/i20 protocol exceeds the single-chip FLOP
ceiling (BENCH_NOTES "Roofline argument"), so the driven path shards
each window — frames over `seq`, rows over `space` — and XLA turns the
PPM pick's top-k memory gathers into all-gathers over ICI. These tests
pin the sharded predictor (the full driven path: padding, windowing,
warm chaining, trims, stitching) exactly to the sequential one.
Match: /root/reference/models/core/ppmstereo.py:238-320 (protocol),
SURVEY.md §2.10 items 2-3 (sharding plan).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.inference import SlidingWindowPredictor
from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=2, num_frames=4,
    force_xla_attention=True, attention_type=None,
)


def _video(n=8, h=64, w=128):
    rng = np.random.default_rng(7)
    return rng.uniform(0, 255, (n, 2, h, w, 3)).astype(np.float32)


def _make(model, params, mesh=None, warm_model=None, **kw):
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)

    def window_fn(l, r):
        return model.apply(params, l, r)

    warm_fn = None
    if warm_model is not None:
        def warm_fn(l, r, fi):
            return warm_model.apply(params, l, r, flow_init=fi)

    return SlidingWindowPredictor(
        window_fn, kernel_size=4, mesh=mesh, warm_window_fn=warm_fn, **kw
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
    left = jnp.zeros((1, 4, 64, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), left, left)
    return model, params


@pytest.mark.slow
def test_sharded_window_predictor_matches_sequential(model_and_params):
    """Strict-parity protocol, every window sharded seq=2 x space=2
    (covers body windows AND the odd tail window)."""
    model, params = model_and_params
    video = _video(n=8)

    out_ref = _make(model, params)(video)
    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2), image_hw=(64, 128))
    out_sh = _make(model, params, mesh=mesh)(video)

    assert out_sh["disparity"].shape == out_ref["disparity"].shape
    np.testing.assert_allclose(
        out_sh["disparity"], out_ref["disparity"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        out_sh["uncertainties"], out_ref["uncertainties"], rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_sharded_warm_windowing_matches_sequential(model_and_params):
    """Warm-start chaining (device-resident seed from the previous
    window) under the sharded mesh — the seed slice/concat runs on
    sharded arrays."""
    model, params = model_and_params
    warm_model = PPMStereo(cfg=CFG, iters=1, test_mode=True)
    video = _video(n=8)

    out_ref = _make(model, params, warm_model=warm_model)(video)
    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2), image_hw=(64, 128))
    out_sh = _make(model, params, mesh=mesh, warm_model=warm_model)(video)

    np.testing.assert_allclose(
        out_sh["disparity"], out_ref["disparity"], rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_sharded_encoder_cache_matches_sequential(model_and_params):
    """Mesh-sharded windows COMPOSED with the encoder cache (per-frame
    features of overlapping frames reused across windows, chained on
    device as sharded arrays) — the deployment shape for a pod slice."""
    model, params = model_and_params
    video = _video(n=8)

    out_ref = _make(model, params)(video)

    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2), image_hw=(64, 128))
    rep = NamedSharding(mesh, P())
    sparams = jax.device_put(params, rep)

    def window_fn(l, r):
        return model.apply(sparams, l, r)

    def enc_fn(l, r):
        return model.apply(sparams, l, r, method="encode_frames")

    def body_fn(l, r, feats):
        return model.apply(sparams, l, r, feats=feats)

    pred = SlidingWindowPredictor(
        window_fn, kernel_size=4, mesh=mesh,
        encode_window_fn=enc_fn, body_window_fn=body_fn,
    )
    assert pred.encoder_cache
    out_sh = pred(video)
    np.testing.assert_allclose(
        out_sh["disparity"], out_ref["disparity"], rtol=1e-4, atol=1e-4
    )


def test_sharded_whole_clip_path(model_and_params):
    """Video shorter than one window: single sharded whole-clip graph."""
    model, params = model_and_params
    video = _video(n=2)
    out_ref = _make(model, params)(video)
    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2), image_hw=(64, 128))
    out_sh = _make(model, params, mesh=mesh, fetch_uncertainty=False)(video)
    np.testing.assert_allclose(
        out_sh["disparity"], out_ref["disparity"], rtol=1e-4, atol=1e-4
    )
