"""Measured same-hardware baseline: torch reference vs ppmstereo_tpu, CPU.

SURVEY.md §6 says to mint our own golden numbers by running the PyTorch
reference, since it publishes none and no GPU exists in this
environment. This times BOTH frameworks' full shipped-config PPMStereo
window forward (ConvNeXt cnet + all attention blocks, test_mode) on the
SAME clip on the SAME host CPU — a measured framework-vs-framework
anchor on identical hardware, replacing nothing about accelerator perf
but grounding `vs_baseline` in at least one real measurement.

Reference entry: /root/reference/models/core/ppmstereo.py::PPMStereo
(shipped config per models/ppm_stereo_model.py:21,47).

Run from repo root:
  JAX_PLATFORMS=cpu PYTHONPATH=. python artifacts/bench_reference_cpu.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default: the round-1 anchor config. Override with env to measure the
# exact BASELINE ladder configs (VERDICT r4 item 7 — the baseline range):
#   short: REF_T=10 REF_H=320 REF_W=512 REF_ITERS=10
#   full:  REF_T=20 REF_H=736 REF_W=1280 REF_ITERS=20 REF_REPS=1 REF_WARMUP=0
# (736x1280 is 720p after the reference's own /32 InputPadder pad.)
T = int(os.environ.get("REF_T", "5"))
H = int(os.environ.get("REF_H", "128"))
W = int(os.environ.get("REF_W", "256"))
ITERS = int(os.environ.get("REF_ITERS", "10"))
REPS = int(os.environ.get("REF_REPS", "3"))
WARMUP = os.environ.get("REF_WARMUP", "1") == "1"

rng = np.random.default_rng(0)
left = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)
right = rng.uniform(0, 255, (1, T, H, W, 3)).astype(np.float32)


def bench_torch():
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import reference_stubs

    reference_stubs.install()
    import importlib
    from unittest import mock

    import torch

    cn = importlib.import_module("models.core.convnext")
    ppm = importlib.import_module("models.core.ppmstereo")
    torch.manual_seed(1)
    fake_backbone = cn.convnextv2_tiny().state_dict()
    with mock.patch.object(torch, "load", lambda *a, **kw: {"model": fake_backbone}):
        torch.manual_seed(0)
        model = ppm.PPMStereo(
            mixed_precision=False,
            num_frames=T,
            attention_type="self_stereo_temporal_update_time_update_space",
            use_3d_update_block=True,
            different_update_blocks=True,
            use_convex_3d=True,
        )
    model.eval()

    l = torch.from_numpy(left).permute(0, 1, 4, 2, 3).contiguous()
    r = torch.from_numpy(right).permute(0, 1, 4, 2, 3).contiguous()
    with torch.no_grad():
        if WARMUP:
            model(l, r, iters=ITERS, test_mode=True)  # warmup
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            model(l, r, iters=ITERS, test_mode=True)
            ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

    cfg = PPMStereoConfig(
        mixed_precision=False,
        use_cnet=True,
        attention_type="self_stereo_temporal_update_time_update_space",
        force_xla_attention=True,  # Pallas kernel is TPU-only
    )
    model = PPMStereo(cfg=cfg, iters=ITERS, test_mode=True)
    lj, rj = jnp.asarray(left), jnp.asarray(right)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lj, rj)
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    np.asarray(fwd(params, lj, rj)[0])  # warmup/compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fwd(params, lj, rj)
        np.asarray(out[0])  # force full execution
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"config: T={T} {H}x{W} iters={ITERS}, full shipped config, CPU", flush=True)
    results = {}
    if which in ("both", "jax"):
        results["jax"] = bench_jax()
        print(f"  ppmstereo_tpu (XLA CPU): {results['jax']:.2f} s/window "
              f"= {T / results['jax']:.3f} frames/s", flush=True)
    if which in ("both", "torch"):
        results["torch"] = bench_torch()
        print(f"  torch reference   (CPU): {results['torch']:.2f} s/window "
              f"= {T / results['torch']:.3f} frames/s", flush=True)
    if len(results) == 2:
        print(f"  speedup (ours/reference): {results['torch'] / results['jax']:.2f}x",
              flush=True)
