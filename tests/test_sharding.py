"""SPMD correctness: sharded forward vs single-device forward.

All three sharding modes are exact (fp32 reduction noise only, ~1e-6):

1. data-axis sharding (the training mode) — batches are independent;
2. GRU-in-scan with seq/space sharding at the unit level;
3. the full model with seq AND space sharded simultaneously.

Historical note: (3) used to diverge by ~1e-1. Bisection
(artifacts/bisect_shard*.py) proved it was a Shardy-partitioner
miscompile of the scanned PPM loop under 2-axis sharding — the
single-device model is not chaotic (1e-6 input noise -> 1e-6 output
change), an unrolled loop was exact, and the classic GSPMD partitioner
was exact. make_mesh() now disables Shardy (parallel/mesh.py); these
tests run at tight tolerances and act as the regression gate for
re-enabling it.
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
def test_seq_space_sharded_forward_exact():
    """Guards the Shardy workaround in make_mesh: under the buggy
    partitioner this diverges to ~1.6e-1; with classic GSPMD it is
    exact to fp32 reduction noise."""
    left, right = _clip()
    model = PPMStereo(cfg=CFG, iters=2, test_mode=True)
    params = model.init(jax.random.PRNGKey(0), left, right)
    disp_ref, _ = jax.jit(model.apply)(params, left, right)

    mesh = make_mesh(MeshSpec(data=1, seq=2, space=2))
    disp, _ = _run(model, params, left, right, mesh, P(None, "seq", "space"))
    assert np.isfinite(np.asarray(disp)).all()
    np.testing.assert_allclose(
        np.asarray(disp), np.asarray(disp_ref), rtol=1e-4, atol=1e-4
    )


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
