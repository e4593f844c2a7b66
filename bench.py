"""Benchmark: frames/s/chip for PPMStereo sliding-window inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Config ladder (BASELINE.json "configs"), selected with BENCH_CONFIG:
  short (default): 320x512, T=10 window, iters=10  — config #2
  full:            720p (736x1280 padded), T=20 window, iters=20 — config #3

vs_baseline compares against an A100 estimate for the PyTorch reference
derived in BASELINE.md terms: the reference publishes no numbers and no
GPU is available here, so the baseline is a roofline-based estimate
documented in BENCH_NOTES.md (updated when better evidence exists).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# A100 reference fps/GPU estimates for the matching STRICT-parity config
# (see BENCH_NOTES.md). Non-parity modes (warm, fast) carry the mode in
# the metric name and report vs_baseline=null: vs_baseline is a
# strict-protocol-to-strict-protocol comparison only.
A100_BASELINE_FPS = {
    "short": 8.0,     # 320x512, kernel 10, iters 10
    "full": 1.0,      # 720p, kernel 20, iters 20
    "full_k10": 1.3,  # 720p, kernel 10, iters 20 (reduced-memory fallback)
}


def main():
    # persistent XLA compilation cache: repeated bench runs skip compiles
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    config = os.environ.get("BENCH_CONFIG", "short")
    if config == "full":
        # BASELINE config #3 exactly: 720p, kernel_size=20, iters=20.
        # Fits one v5e (measured 2026-08-17: 36.45 s/window device-side,
        # artifacts/try_720p_k20.py) — the earlier ~14 GB multi-chip-only
        # estimate was wrong.
        h, w, t_window, iters = 720, 1280, 20, 20
    elif config == "full_k10":
        # the reference's own reduced-memory fallback (README "GPU
        # memory note")
        h, w, t_window, iters = 720, 1280, 10, 20
    elif config == "full_warm":
        # 720p/k20/i20 first window, then warm-started windows (previous
        # window's disparity seeds the 1/4 loop; 1/16+1/8+SST skipped)
        # at iters=10 — the reference's own documented fallback budget.
        # Non-parity; EPE impact quantified in tests/test_warm_start.py
        # and BENCH_NOTES.md.
        h, w, t_window, iters = 720, 1280, 20, 20
    else:
        h, w, t_window, iters = 320, 512, 10, 10
    warm_start = config == "full_warm"
    warm_iters = int(os.environ.get("BENCH_WARM_ITERS", "10"))

    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
    from ppmstereo_tpu.models.inference import SlidingWindowPredictor

    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=cfg, iters=iters, test_mode=True)

    rng = np.random.default_rng(0)
    # BENCH_N_WINDOWS scales the video length (default 2 windows' worth):
    # warm/fast modes amortize the cold first window over more windows,
    # so their steady-state fps needs a longer video to show
    n_frames = int(os.environ.get("BENCH_N_WINDOWS", "2")) * t_window
    # uint8 frames: the wire format of every real dataset, and 4x less
    # host->device transfer than float32 (the model casts on device)
    video = rng.integers(0, 255, (n_frames, 2, h, w, 3)).astype(np.uint8)

    # init params at padded window shape
    from ppmstereo_tpu.ops.padding import InputPadder

    padder = InputPadder(h, w, divis_by=32)
    ph, pw = padder.padded_hw
    init_l = jnp.zeros((1, t_window, ph, pw, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_l, init_l)

    def window_fn(left, right):
        return model.apply(params, left, right)

    warm_fn = None
    if warm_start:
        model_warm = PPMStereo(cfg=cfg, iters=warm_iters, test_mode=True)

        def warm_fn(left, right, flow_init):
            return model_warm.apply(params, left, right, flow_init=flow_init)

    # optional knobs (defaults preserve strict reference parity):
    #   BENCH_BATCH_WINDOWS=N  batch N independent windows per device call
    #                          (bit-identical stitching)
    #   BENCH_FAST=1           non-overlapping windows (non-parity, ~2x)
    batch_windows = int(os.environ.get("BENCH_BATCH_WINDOWS", "1"))
    fast_mode = os.environ.get("BENCH_FAST", "0") == "1"
    # BENCH_WIRE_F16=1 fetches outputs as f16 (upcast on host) — halves
    # the tunnel download. Non-parity (wire quantization ~0.03 px);
    # only honored in the already-non-parity modes.
    wire_f16 = (
        os.environ.get("BENCH_WIRE_F16", "0") == "1"
        and (fast_mode or warm_start)
    )
    # BENCH_ENC_CACHE=1 reuses per-frame encoder features across
    # overlapping windows (strict parity preserved — the encoders are
    # per-frame; exactness: test_harness.py::test_encoder_cache_matches_
    # uncached). Off by default until measured a win on-chip.
    enc_cache = os.environ.get("BENCH_ENC_CACHE", "0") == "1"
    enc_fn = body_fn = warm_body_fn = None
    if enc_cache:
        def enc_fn(left, right):
            return model.apply(params, left, right, method="encode_frames")

        def body_fn(left, right, feats):
            return model.apply(params, left, right, feats=feats)

        if warm_start:
            def warm_body_fn(left, right, flow_init, feats):
                return model_warm.apply(
                    params, left, right, flow_init=flow_init, feats=feats
                )

    # BENCH_FETCH_UNC=1 also fetches the uncertainty maps. Default off:
    # the bench (and the reference evaluator) consume disparity only, and
    # the unused uncertainty wire copy would dominate on this tunnel.
    # Disparity values are bit-identical either way (the in-loop
    # uncertainty head always runs — it feeds the PPM pick scores).
    fetch_unc = os.environ.get("BENCH_FETCH_UNC", "0") == "1"
    predictor = SlidingWindowPredictor(
        window_fn, kernel_size=t_window, fast_mode=fast_mode,
        batch_windows=batch_windows, warm_window_fn=warm_fn,
        wire_dtype=jnp.float16 if wire_f16 else None,
        fetch_uncertainty=fetch_unc,
        encode_window_fn=enc_fn, body_window_fn=body_fn,
        warm_body_window_fn=warm_body_fn,
    )

    # warmup (compile): run the exact measured workload once so every
    # window-shape/batch-group graph it needs is compiled. The remote
    # compile service throws transient INTERNAL/UNAVAILABLE errors under
    # load; retry the warmup a few times before giving up so one flake
    # doesn't void a bench run (successful compiles land in the
    # persistent cache, so retries only redo the failed graph).
    for attempt in range(3):
        try:
            _ = predictor(video)
            break
        except Exception as e:  # noqa: BLE001 - backend errors aren't typed
            msg = str(e)
            transient = any(s in msg for s in
                            ("remote_compile", "UNAVAILABLE", "INTERNAL"))
            if not transient or attempt == 2:
                raise
            # stderr: stdout carries exactly ONE JSON line (the contract)
            print(f"# warmup compile flake (attempt {attempt + 1}): "
                  f"{msg.splitlines()[0][:120]}", file=sys.stderr, flush=True)
            time.sleep(20)

    # best of 2 timed passes: the tunnel's transfer rate varies by the
    # minute (BENCH_NOTES "Tunnel characterization"); min-over-reps is
    # the standard latency-bench idiom and what the device can actually do
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = predictor(video)
        dt = min(dt, time.perf_counter() - t0)
    n_out = len(out["disparity"])

    # device-side decomposition: time the steady-state window graph alone
    # (block_until_ready, min of 2 reps — the cached jit from the run
    # above) so tunnel-transfer drift is diagnosable round-over-round
    # (the axon tunnel moves ~15-25 MB/s and varies by the hour; see
    # BENCH_NOTES.md "Tunnel characterization").
    stride = t_window if fast_mode else t_window // 2
    starts = [
        i for i in range(0, n_frames, stride)
        if i == 0 or min(i + t_window, n_frames) - i >= stride
    ]
    dleft = jnp.asarray(video[:t_window, 0])
    dright = jnp.asarray(video[:t_window, 1])
    device_s = []
    for _ in range(2):
        td = time.perf_counter()
        outs = predictor._run_window(dleft, dright)
        jax.block_until_ready(outs)
        device_s.append(time.perf_counter() - td)
    device_s_per_window = min(device_s)
    warm_s_per_window = None
    if warm_start and len(starts) > 1:
        prev = outs[0]
        for _ in range(2):
            td = time.perf_counter()
            wouts = predictor._run_window_warm(
                dleft, dright, prev, t_window - stride
            )
            jax.block_until_ready(wouts)
            warm_s_per_window = min(
                warm_s_per_window or 1e9, time.perf_counter() - td
            )

    if warm_start:
        compute_s = device_s_per_window + warm_s_per_window * (len(starts) - 1)
    else:
        compute_s = device_s_per_window * len(starts)

    fps = n_out / dt
    # metric name carries the parity mode; vs_baseline is strict-to-strict
    # only (non-parity modes report null)
    tags = ""
    if warm_start:
        tags += "_warm"
    if fast_mode:
        tags += "_fast"
    if tags:
        tags += "_nonparity"
    base_cfg = "full" if config == "full_warm" else config
    strict = not tags
    baseline = A100_BASELINE_FPS[base_cfg]
    record = {
        "metric": (
            f"ppmstereo_{base_cfg}_{h}x{w}_k{t_window}_i{iters}{tags} "
            "frames/s/chip"
        ),
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3) if strict else None,
        "wall_s": round(dt, 3),
        "n_frames_out": n_out,
        "n_windows": len(starts),
        "device_s_per_window": round(device_s_per_window, 3),
        "device_s_per_warm_window": (
            round(warm_s_per_window, 3) if warm_s_per_window else None
        ),
        "transfer_overhead_s": round(max(0.0, dt - compute_s), 3),
        "uncertainty_fetched": fetch_unc,
        # NB: device_s_per_window times the UNCACHED window graph; with
        # encoder_cache the steady-state windows are cheaper, so
        # transfer_overhead_s is a lower bound in that mode
        "encoder_cache": enc_cache,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
