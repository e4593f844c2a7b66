"""SPMD correctness: sharded forward vs single-device forward.

All sharding modes are exact (fp32 reduction noise only, ~1e-6):

1. data-axis sharding (the training mode) — batches are independent;
2. GRU-in-scan with seq/space sharding at the unit level;
3. the full model with seq AND space sharded simultaneously, under the
   DEFAULT Shardy partitioner at adequate shapes (the round-4 explicit
   conv padding fix, nn/common.py);
4. the same at tiny shapes previously inside the Shardy danger region
   — exact under Shardy since round 5's in-model row-replication
   mitigation (models/ppm_stereo.py::_tiny_row_shards); no GSPMD
   fallback exists anymore;
5. scan+remat GRADIENTS of the refinement loop under Shardy.

Historical note: (3) used to diverge by ~1e-1 under Shardy. Round-3
bisection produced a minimal repro (artifacts/shardy_repro.py: scan +
implicitly-padded conv + 2-axis sharding); round 4 found lowering every
Conv as explicit jnp.pad + VALID partitions exactly
(artifacts/shardy_probe_r4.py) except when a 1/16-scale space shard is
not larger than a chained conv's halo (shardy_bisect_loop_r4.py) —
round 4 pinned classic GSPMD there; round 5 replaced the fallback with
stage-local row replication inside the model, deleting the deprecated-
GSPMD dependency entirely.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

CFG = PPMStereoConfig(
    mixed_precision=False, use_cnet=False, top_k=4, force_xla_attention=True,
)


def _clip(b=1):
    rng = np.random.default_rng(3)
    left = jnp.asarray(rng.uniform(0, 255, (b, 4, 64, 128, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (b, 4, 64, 128, 3)).astype(np.float32))
    return left, right


def _run(model, params, left, right, mesh, spec):
    sh = NamedSharding(mesh, spec)
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        model.apply,
        in_shardings=(jax.tree_util.tree_map(lambda _: rep, params), sh, sh),
    )
    # trace under the mesh context: the model's sharding hints (memory-
    # bank seq-replication, tiny-row-shard Shardy mitigation) read the
    # AMBIENT mesh at trace time — every framework entry point
    # (SlidingWindowPredictor._jit, trainer, streaming) traces inside
    # `with mesh:`, so tests must too
    with mesh:
        return fn(
            jax.device_put(params, rep),
            jax.device_put(left, sh),
            jax.device_put(right, sh),
        )


@pytest.mark.slow
def test_data_parallel_sharding_is_exact():
    left, right = _clip(b=2)
    model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp_ref, _ = jax.jit(model.apply)(params, left, right)

    mesh = make_mesh(MeshSpec(data=2))
    disp, _ = _run(model, params, left, right, mesh, P("data"))
    np.testing.assert_allclose(
        np.asarray(disp), np.asarray(disp_ref), rtol=1e-5, atol=1e-5
    )


def test_gru_in_scan_seq_space_sharded_unit():
    from flax import linen as nn

    from ppmstereo_tpu.nn.gru import SKSepConvGRU3D

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((1, 4, 16, 32, 128)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((1, 4, 16, 32, 384)).astype(np.float32))

    class Wrap(nn.Module):
        def setup(self):
            self.gru = SKSepConvGRU3D(hidden_dim=128)

        def __call__(self, h, x):
            def body(mdl, c, _):
                return mdl.gru(c, x), None

            scan = nn.scan(
                body, variable_broadcast="params",
                split_rngs={"params": False}, length=1,
            )
            out, _ = scan(self, h, None)
            return out

    wrap = Wrap()
    params = wrap.init(jax.random.PRNGKey(0), h0, x0)
    ref = jax.jit(wrap.apply)(params, h0, x0)

    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
    out = _run(wrap, params, h0, x0, mesh, P(None, "seq", "space"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_seq_space_sharded_forward_exact_tiny_shape_under_shardy():
    """64-px clips put 2-row space shards at the 1/16 stage — the shape
    class where Shardy used to return O(1e-1)-wrong values (round-4
    danger region). Round 5: the model pins such stages' rows
    replicated (_tiny_row_shards), so the DEFAULT partitioner is exact
    here and make_mesh never falls back to classic GSPMD."""
    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", True)
        left, right = _clip()
        model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
        params = model.init(jax.random.PRNGKey(0), left, right)
        disp_ref, _ = jax.jit(model.apply)(params, left, right)

        mesh = make_mesh(
            MeshSpec(data=1, seq=2, space=2), image_hw=(64, 128)
        )
        assert jax.config.jax_use_shardy_partitioner  # no GSPMD pin exists
        disp, _ = _run(
            model, params, left, right, mesh, P(None, "seq", "space"))
        assert np.isfinite(np.asarray(disp)).all()
        np.testing.assert_allclose(
            np.asarray(disp), np.asarray(disp_ref), rtol=1e-4, atol=1e-4
        )
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)


@pytest.mark.slow
def test_seq_space_sharded_forward_exact_under_shardy():
    """The SCAN-BASED model under the DEFAULT Shardy partitioner at an
    adequate shape (128-px: 4-row 1/16 space shards > halo 3): exact
    since the explicit-padding Conv lowering (nn/common.py). This is the
    round-4 closure of the GSPMD dependency — no unroll, no pin."""
    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", True)
        rng = np.random.default_rng(3)
        left = jnp.asarray(
            rng.uniform(0, 255, (1, 4, 128, 128, 3)).astype(np.float32))
        right = jnp.asarray(
            rng.uniform(0, 255, (1, 4, 128, 128, 3)).astype(np.float32))
        model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
        params = model.init(jax.random.PRNGKey(0), left, right)
        disp_ref, _ = jax.jit(model.apply)(params, left, right)

        mesh = make_mesh(
            MeshSpec(data=1, seq=2, space=2), image_hw=(128, 128)
        )
        assert jax.config.jax_use_shardy_partitioner  # no fallback fired
        disp, _ = _run(
            model, params, left, right, mesh, P(None, "seq", "space"))
        np.testing.assert_allclose(
            np.asarray(disp), np.asarray(disp_ref), rtol=1e-4, atol=1e-4
        )
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)


def test_refinement_loop_grads_exact_under_shardy_seq_space():
    """Scan + per-iteration remat BACKWARD under Shardy with seq+space
    sharding (the training composition): grads of the refinement loop
    must match the single-device grads."""
    from ppmstereo_tpu.models.ppm_stereo import PPMUpdateLoop
    from ppmstereo_tpu.ops.corr import build_corr_pyramid
    from ppmstereo_tpu.ops.geometry import coords_grid_x

    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", True)
        b, t, h, w, c = 1, 4, 16, 32, 128
        rng = np.random.default_rng(0)

        def r(*shape):
            return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        fmap1, fmap2 = r(b, t, h, w, 256), r(b, t, h, w, 256)
        pyramid = build_corr_pyramid(
            fmap1.reshape(b * t, h, w, -1), fmap2.reshape(b * t, h, w, -1),
            CFG.corr_levels,
        )
        coords0 = coords_grid_x(b * t, h, w)
        args = (
            pyramid, coords0, r(b, t, h, w, c), r(b, t, h, w, 2 * c),
            r(b, t, t) * 0.1, r(b, t, h, w, 2) * 0.5,
            jnp.tanh(r(b, t, h, w, 128)), jax.nn.relu(r(b, t, h, w, 128)),
            jnp.zeros((b, t, h, w, 64)),
        )
        loop = PPMUpdateLoop(
            cfg=CFG, iters=2, interp_scale=1, collect_preds=True)
        params = loop.init(jax.random.PRNGKey(0), *args)

        def loss(p, *a):
            preds = loop.apply(p, *a)[4]
            return jnp.mean(jnp.abs(preds))

        g_ref = jax.jit(jax.grad(loss))(params, *args)

        # the loop's h=16 here plays the role of a 1/16-scale map of a
        # 256-px image: 8-row space shards, comfortably Shardy-safe
        mesh = make_mesh(
            MeshSpec(data=1, seq=2, space=2), image_hw=(16 * 16, w)
        )
        assert jax.config.jax_use_shardy_partitioner
        rep = NamedSharding(mesh, P())
        sh = NamedSharding(mesh, P(None, "seq", "space"))
        sh_pyr = NamedSharding(mesh, P("seq", "space"))
        sh_c0 = NamedSharding(mesh, P(None, "space"))
        sh_sim = NamedSharding(mesh, P(None, "seq"))
        in_sh = (
            jax.tree_util.tree_map(lambda _: rep, params),
            [sh_pyr] * len(pyramid), sh_c0, sh, sh, sh_sim, sh, sh, sh, sh,
        )
        with mesh:
            g = jax.jit(jax.grad(loss), in_shardings=in_sh)(
                *jax.tree_util.tree_map(
                    jax.device_put, (params, *args), in_sh)
            )
        for ref_leaf, leaf in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref_leaf), rtol=2e-4, atol=2e-4
            )
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)


@pytest.mark.slow
def test_seq_space_sharded_unrolled_forward_exact_under_shardy():
    """The Shardy-native formulation: with the refinement loop unrolled
    (cfg.unroll_refinement_loop — no lax.scan in the forward), the
    seq+space sharded model is exact UNDER SHARDY, the JAX 0.9 default
    partitioner. This is the escape hatch for the day the deprecated
    classic-GSPMD flag disappears; the scan-based model under Shardy
    diverges to ~1.6e-1 (minimal upstream repro:
    artifacts/shardy_repro.py)."""
    from jax.sharding import Mesh

    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", True)
        cfg_unrolled = dataclasses.replace(CFG, unroll_refinement_loop=True)
        left, right = _clip()
        model = PPMStereo(cfg=cfg_unrolled, iters=2, test_mode=True)
        params = model.init(jax.random.PRNGKey(0), left, right)
        disp_ref, _ = jax.jit(model.apply)(params, left, right)

        devs = np.asarray(jax.devices()[:4]).reshape(1, 2, 2)
        mesh = Mesh(devs, axis_names=("data", "seq", "space"))
        disp, _ = _run(model, params, left, right, mesh, P(None, "seq", "space"))
        np.testing.assert_allclose(
            np.asarray(disp), np.asarray(disp_ref), rtol=1e-4, atol=1e-4
        )
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)


def test_unrolled_loop_matches_scan():
    """cfg.unroll_refinement_loop is numerically identical to the scan
    (same body, same params) on a single device."""
    left, right = _clip()
    model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp_scan, _ = jax.jit(model.apply)(params, left, right)

    cfg_unrolled = dataclasses.replace(CFG, unroll_refinement_loop=True)
    model_u = PPMStereo(cfg=cfg_unrolled, iters=2, test_mode=True)
    disp_unrolled, _ = jax.jit(model_u.apply)(params, left, right)
    np.testing.assert_allclose(
        np.asarray(disp_unrolled), np.asarray(disp_scan), rtol=1e-6, atol=1e-6
    )
