"""Benchmark: frames/s/chip for PPMStereo sliding-window inference.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N|null, "unit": "frames/s/chip",
   "vs_baseline": {"low": N, "mid": N, "high": N}|null, ...}

Value semantics (fixed, round 5 — VERDICT r4 weak #2): `value` is the
measured END-TO-END frames/s of the selected config, or null if no
clean e2e pass completed before the deadline. The single-window
device-side marginal rate always lands in its OWN field
(`device_only_fps`) and is never promoted into `value` — so the
round-over-round `value` series is strict-e2e-comparable by
construction (pinned by tests/test_bench_contract.py).

Config ladder (BASELINE.json "configs"), selected with BENCH_CONFIG:
  short (default): 320x512, T=10 window, iters=10  — config #2
  full:            720p (736x1280 padded), T=20 window, iters=20 — config #3

Every `short` driver run ALSO measures the north-star 720p protocol
when the deadline allows (VERDICT r4 item 1): a budgeted single-window
full-config device measurement + a warm-window measurement, emitted as
`full_*` fields in the same record — so BENCH_rNN.json tracks the
headline shape every round, not just the short config.

vs_baseline is a RANGE {"low","mid","high"}, not a point (VERDICT r4
weak #7): the reference publishes no numbers and no GPU exists here, so
the A100 denominator spans an achieved-utilization band applied to the
exact protocol graph's analytic FLOP count, cross-checked against the
torch reference measured on this host's CPU (full derivation:
BENCH_NOTES.md "A100 baseline estimate"). `low` divides by the most
generous A100 estimate — quote THAT bound when claiming a win.
Non-strict modes (warm/fast, incl. BENCH_CONFIG=short_warm/full_warm)
report null.

Survivability (round-4 hardening): the axon TPU tunnel degrades by the
hour (BENCH_NOTES "Tunnel characterization" — 300 s d2h stalls, 1285 s
compile-cache loads were measured in round 3, and the round-3 driver
bench timed out with no output at all). This bench therefore:
  * runs a watchdog thread with an internal deadline (BENCH_DEADLINE_S,
    default 420 s) that emits the best measurement recorded so far with
    "degraded": true and force-exits BEFORE any external timeout;
  * handles SIGTERM/SIGINT the same way (for when the external timeout
    is shorter than the deadline);
  * measures progressively — a single-window device-side number lands
    in the emittable record before the full end-to-end passes start;
  * falls back to the last committed good run (BENCH_LAST_GOOD.json,
    flagged "stale": true) if killed before ANY measurement completes —
    e.g. a cold compile cache on a day the compile service takes 20 min;
  * uses a persistent XLA compilation cache inside the repo
    (.jax_cache/) that this session pre-warms, so the driver's run
    skips compiles entirely on a healthy day.
Stdout carries exactly one JSON line no matter which path fires; all
progress chatter goes to stderr.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_LAST_GOOD_PATH = os.path.join(_REPO, "BENCH_LAST_GOOD.json")

# A100 reference fps/GPU estimate RANGES (low, mid, high) for the
# matching STRICT-parity config. Derivation (full audit trail in
# BENCH_NOTES.md "A100 baseline estimate", round-5 revision):
#   fps = stride * util * 312e12 / window_FLOPs
# where window_FLOPs is the analytic per-window FLOP count of the exact
# protocol graph (dominated by the play attention; cross-checked
# against measured v5e device times at measured kernel utilizations,
# and against the torch reference measured on this host's CPU at the
# exact configs), 312 TFLOP/s is A100 bf16 peak, and util spans
# (15%, 30%, 55%) — the plausible ACHIEVED-utilization band for the
# eager torch reference (its per-frame CUDA flash-attn calls at the big
# 720p seqlens can reach ~55%; the smaller short-config shapes and the
# eager conv/GRU stack pull the floor toward 15%). Non-parity modes
# (warm, fast) carry the mode in the metric name and report
# vs_baseline=null: strict-to-strict comparison only.
A100_BASELINE_FPS_RANGE = {
    # 320x512 k10 i10: ~50e12 FLOP/window, stride 5
    "short": (4.7, 9.4, 17.2),
    # 720p k20 i20: ~4150e12 FLOP/window, stride 10
    "full": (0.11, 0.23, 0.42),
    # 720p k10 i20 (reduced-memory fallback): ~2050e12 FLOP/window, stride 5
    "full_k10": (0.11, 0.23, 0.42),
}


def _vs_baseline_range(fps: float, config: str, strict: bool):
    """{"low","mid","high"} ratios vs the baseline range, or None.
    `low` = fps / highest plausible A100 fps — the conservative bound."""
    rng_ = A100_BASELINE_FPS_RANGE.get(config)
    if not strict or rng_ is None or not fps:
        return None
    lo_base, mid_base, hi_base = rng_
    return {
        "low": round(fps / hi_base, 3),
        "mid": round(fps / mid_base, 3),
        "high": round(fps / lo_base, 3),
    }

# ---------------------------------------------------------------------------
# Emission machinery: one JSON line on stdout, exactly once, no matter how
# the process dies (normal exit, watchdog deadline, SIGTERM from an
# external `timeout`).
# ---------------------------------------------------------------------------

_BEST: dict = {}          # best record so far; mutated as phases complete
_LOCK = threading.Lock()
_PRINTED = threading.Event()
_T_START = time.monotonic()


def _log(msg: str) -> None:
    print(f"# [{time.monotonic() - _T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _load_last_good() -> dict | None:
    try:
        with open(_LAST_GOOD_PATH) as f:
            rec = json.load(f)
        return rec if isinstance(rec, dict) and "value" in rec else None
    except Exception:
        return None


def _save_last_good(rec: dict) -> None:
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    except Exception as e:  # noqa: BLE001 - best-effort persistence
        _log(f"could not persist last-good record: {e}")


def _emit(final: bool) -> None:
    """Print the single JSON result line (idempotent)."""
    with _LOCK:
        if _PRINTED.is_set():
            return
        if _BEST:
            rec = dict(_BEST)
            if not final:
                rec["degraded"] = True
        else:
            # Killed before any measurement completed (e.g. cold-cache
            # compile exceeded the deadline): fall back to the last
            # committed good run so the driver still gets a parseable,
            # clearly-flagged line instead of nothing.
            rec = _load_last_good()
            if rec is not None:
                rec = dict(rec)
                rec["degraded"] = True
                rec["stale"] = True
            else:
                rec = {
                    "metric": "ppmstereo_bench_incomplete",
                    "value": 0.0,
                    "unit": "frames/s/chip",
                    "vs_baseline": None,
                    "degraded": True,
                    "error": ("no measurement completed before the "
                              "deadline and no BENCH_LAST_GOOD.json"),
                }
        _PRINTED.set()
        print(json.dumps(rec), flush=True)


def _watchdog(deadline_s: float) -> None:
    # A daemon thread, not a signal handler: a SIGALRM/SIGTERM handler
    # only runs when the MAIN thread returns to the bytecode loop, which
    # never happens while it is blocked inside a tunnel RPC — exactly the
    # failure mode being defended against. os._exit from this thread
    # terminates the process regardless of what the main thread is doing.
    remaining = deadline_s - (time.monotonic() - _T_START)
    if remaining > 0:
        time.sleep(remaining)
    if _PRINTED.is_set():
        return
    _log(f"watchdog: deadline {deadline_s:.0f}s hit — emitting best-so-far")
    _emit(final=False)
    sys.stdout.flush()
    os._exit(0)


def _signal_exit(signum, frame):  # noqa: ARG001
    _log(f"signal {signum} — emitting best-so-far")
    _emit(final=False)
    sys.stdout.flush()
    os._exit(0)


def _deadline_left(deadline_s: float) -> float:
    return deadline_s - (time.monotonic() - _T_START)


# ---------------------------------------------------------------------------


def main():
    # persistent XLA compilation cache: repeated bench runs skip compiles.
    # Inside the repo (gitignored) so it survives anything that preserves
    # the working tree; this session pre-warms it for the driver's run.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
    )
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "420"))
    threading.Thread(
        target=_watchdog, args=(deadline_s,), daemon=True
    ).start()
    signal.signal(signal.SIGTERM, _signal_exit)
    signal.signal(signal.SIGINT, _signal_exit)
    ready = os.environ.get("BENCH_READY_FILE")
    if ready:  # test hook: signal handlers are now installed
        with open(ready, "w") as f:
            f.write("ready\n")

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
    elif config == "short_warm":
        # warm-start at the short operating point (cold i10, warm i5 —
        # the anchor EPE table's sanctioned budget, which IMPROVES
        # EPE/TEPE with trained weights: EPE_rNN.json). Non-parity.
        h, w, t_window, iters = 320, 512, 10, 10
    elif config == "tiny":
        # self-test config (not a BASELINE row): exercises every phase of
        # the bench machinery in seconds on CPU — used by
        # tests/test_bench_contract.py
        h, w, t_window, iters = 64, 96, 4, 2
    else:
        h, w, t_window, iters = 320, 512, 10, 10
    warm_start = config in ("full_warm", "short_warm")
    warm_iters = int(os.environ.get(
        "BENCH_WARM_ITERS", "5" if config == "short_warm" else "10"
    ))

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

    # metric naming: carries the parity mode; vs_baseline is
    # strict-to-strict only (non-parity modes report null)
    tags = ""
    if warm_start:
        tags += "_warm"
    if fast_mode:
        tags += "_fast"
    if tags:
        tags += "_nonparity"
    base_cfg = {"full_warm": "full", "short_warm": "short"}.get(config, config)
    strict = not tags
    metric = (
        f"ppmstereo_{base_cfg}_{h}x{w}_k{t_window}_i{iters}{tags} "
        "frames/s/chip"
    )
    stride = t_window if fast_mode else t_window // 2
    # window schedule diagnostics: mirror the predictor's own job logic —
    # in fast mode short tails are kept, otherwise sub-stride tails merge
    # into the preceding window
    starts = [
        i for i in range(0, n_frames, stride)
        if i == 0 or fast_mode
        or min(i + t_window, n_frames) - i >= stride
    ]

    # ---- Phase A: single-window device-side measurement ----------------
    # The minimal number that makes the round's bench non-null: compile
    # (or cache-load) + run ONE window, block_until_ready. Lands in _BEST
    # before the end-to-end passes start, so a watchdog fire after this
    # point reports a real measured value.
    # open the d2h channel concurrently with the first compile: the
    # FIRST device->host transfer of a fresh process stalls 10-300 s on
    # a degraded tunnel (BENCH_NOTES "Tunnel characterization"); doing
    # the scalar fetch on a side thread overlaps that stall with the
    # window compile so neither phase A's timings nor the deadline pay
    # for it twice
    warm_t0 = time.monotonic()

    def _open_d2h():
        _ = float(jnp.zeros(()) + 1.0)
        _log(f"d2h warmup fetch done at +{time.monotonic() - warm_t0:.1f}s")

    d2h_thread = threading.Thread(target=_open_d2h, daemon=True)
    d2h_thread.start()

    _log(f"phase A: single-window device measurement ({config})")
    dleft = jnp.asarray(video[:t_window, 0])
    dright = jnp.asarray(video[:t_window, 1])

    def _sync(o):
        # On the axon tunnel backend block_until_ready returns without
        # waiting for remote execution; a scalar fetch of a device-side
        # reduction is the only reliable sync (the pattern every
        # artifacts/ timing script uses). The mean adds ~us of device
        # work and 4 wire bytes.
        return float(jnp.mean(o[0]))

    # phase A performs the first compile — retry the documented
    # transient compile-service flakes here too (successful compiles
    # land in the persistent cache, so a retry only redoes the failure)
    t0 = time.monotonic()
    for attempt in range(3):
        try:
            outs = predictor._run_window(dleft, dright)
            d2h_thread.join()  # stall absorbed; timings below are clean
            _sync(outs)
            break
        except Exception as e:  # noqa: BLE001 - backend errors untyped
            msg = str(e)
            transient = any(s in msg for s in
                            ("remote_compile", "UNAVAILABLE", "INTERNAL"))
            if not transient or attempt == 2:
                raise
            _log(f"phase A compile flake (attempt {attempt + 1}): "
                 f"{msg.splitlines()[0][:120]}")
            time.sleep(20)
    first_s = time.monotonic() - t0
    _log(f"phase A: first window (incl. compile/cache-load) {first_s:.1f}s")
    t0 = time.monotonic()
    outs = predictor._run_window(dleft, dright)
    _sync(outs)
    device_s_per_window = time.monotonic() - t0
    _log(f"phase A: steady device window {device_s_per_window:.2f}s")
    # Kept-frames accounting at the strict stitch: interior windows
    # contribute `stride` new frames each; a window in isolation keeps
    # all t_window. The steady-state marginal rate (stride frames per
    # window) goes in `device_only_fps`; `value` stays null until a
    # clean e2e pass lands (fixed semantics — VERDICT r4 weak #2: the
    # device-only rate excludes transfers and must never masquerade as
    # the tracked e2e series).
    with _LOCK:
        _BEST.update({
            "metric": metric,
            "value": None,
            "unit": "frames/s/chip",
            "vs_baseline": None,
            "partial": "device_only_single_window",
            "device_only_fps": round(stride / device_s_per_window, 3),
            "device_s_per_window": round(device_s_per_window, 3),
            "first_window_s": round(first_s, 3),
            "n_windows": len(starts),
            "uncertainty_fetched": fetch_unc,
            "encoder_cache": enc_cache,
        })

    if os.environ.get("BENCH_STOP_AFTER_PHASE_A") == "1":
        # test hook (tests/test_bench_contract.py): emit exactly the
        # record a watchdog fire after phase A would produce — pins the
        # device-only partial schema (value null, device_only_fps set)
        _emit(final=False)
        sys.stdout.flush()
        os._exit(0)

    warm_s_per_window = None
    if (warm_start and len(starts) > 1
            and _deadline_left(deadline_s) > 3 * first_s):
        prev = outs[0]
        for _ in range(2):
            td = time.monotonic()
            wouts = predictor._run_window_warm(
                dleft, dright, prev, t_window - stride
            )
            _sync(wouts)
            warm_s_per_window = min(
                warm_s_per_window or 1e9, time.monotonic() - td
            )
        _log(f"phase A: warm window {warm_s_per_window:.2f}s")
        with _LOCK:
            _BEST["device_s_per_warm_window"] = round(warm_s_per_window, 3)
            _BEST["device_only_fps"] = round(stride / warm_s_per_window, 3)

    # ---- Phase B: end-to-end passes ------------------------------------
    # Pass 1 doubles as the warmup for any remaining graph shapes (tail
    # windows, batch groups) AND a timed sample; pass 2 refines with the
    # min-over-reps idiom if the deadline allows. The remote compile
    # service throws transient INTERNAL/UNAVAILABLE under load — retry.
    if warm_start:
        compute_s = (
            device_s_per_window
            + (warm_s_per_window or device_s_per_window) * (len(starts) - 1)
        )
    else:
        compute_s = device_s_per_window * len(starts)

    dt = float("inf")
    n_out = None
    n_passes = 2 if _deadline_left(deadline_s) > 4 * compute_s else 1
    for p in range(n_passes):
        if p > 0 and _deadline_left(deadline_s) < 2.5 * min(
                dt, 2.0 * compute_s + 30):
            _log("phase B: skipping further passes (deadline)")
            break
        for attempt in range(3):
            try:
                t0 = time.monotonic()
                out = predictor(video)
                dt = min(dt, time.monotonic() - t0)
                break
            except Exception as e:  # noqa: BLE001 - backend errors untyped
                msg = str(e)
                transient = any(s in msg for s in
                                ("remote_compile", "UNAVAILABLE", "INTERNAL"))
                if not transient or attempt == 2:
                    raise
                _log(f"e2e pass flake (attempt {attempt + 1}): "
                     f"{msg.splitlines()[0][:120]}")
                time.sleep(20)
        n_out = len(out["disparity"])
        fps = n_out / dt
        _log(f"phase B: pass {p + 1}: {dt:.1f}s e2e, {fps:.3f} fps")
        if p == 0 and dt > 1.5 * compute_s + 30:
            # pass 1 was dominated by residual graph compiles/cache
            # loads (observed 226 s for a 2.9 s workload on a degraded
            # day) — record it as warmup only; value stays null (with
            # device_only_fps populated) until a clean e2e pass lands
            _log("phase B: pass 1 compile-dominated — not recording as e2e")
            with _LOCK:
                _BEST["first_e2e_pass_s"] = round(dt, 3)
            dt = float("inf")
            continue
        with _LOCK:
            _BEST.update({
                "value": round(fps, 3),
                "vs_baseline": _vs_baseline_range(fps, base_cfg, strict),
                "wall_s": round(dt, 3),
                "n_frames_out": n_out,
                "transfer_overhead_s": round(max(0.0, dt - compute_s), 3),
                # NB: device_s_per_window times the UNCACHED window
                # graph; with encoder_cache the steady-state windows are
                # cheaper, so transfer_overhead_s is a lower bound there
            })
            _BEST.pop("partial", None)
            if p == 0 and n_passes > 1:
                _BEST["partial"] = "single_e2e_pass"

    # ---- Phase C: north-star full-config record (VERDICT r4 item 1) ----
    # Every `short` driver run also measures the 720p/k20/i20 protocol
    # (BASELINE config #3) on-device, plus its warm-window sanctioned
    # mode, into full_* fields of the same record — so BENCH_rNN.json
    # tracks the headline shape every round. Budget-gated: a degraded
    # day emits the short result it already has. BENCH_FULL=0 skips.
    run_full = (
        os.environ.get("BENCH_FULL", "1") == "1"
        and config in ("short", "tiny")
    )
    if run_full:
        if config == "tiny":
            fh, fw, ft, fi, fwarm_i = 64, 96, 4, 2, 1
            est = 30.0
        else:
            fh, fw, ft, fi, fwarm_i = 720, 1280, 20, 20, 10
            # cost model: full-graph compile/cache-load <= 2x the short
            # first window + init + 2 strict windows (~36 s measured)
            est = 2.0 * first_s + 15 + 2 * 36
        if _deadline_left(deadline_s) <= est:
            _log(f"phase C: skipped — deadline left "
                 f"{_deadline_left(deadline_s):.0f}s < est {est:.0f}s")
        else:
            _log(f"phase C: full-config ({fh}x{fw} k{ft} i{fi}) device "
                 "measurement")
            try:
                fstride = ft // 2
                fmodel = PPMStereo(cfg=cfg, iters=fi, test_mode=True)
                fmodel_warm = PPMStereo(
                    cfg=cfg, iters=fwarm_i, test_mode=True
                )
                fpadder = InputPadder(fh, fw, divis_by=32)
                fph, fpw = fpadder.padded_hw
                finit = jnp.zeros((1, ft, fph, fpw, 3), jnp.float32)
                fparams = jax.jit(fmodel.init)(
                    jax.random.PRNGKey(0), finit, finit
                )
                fpred = SlidingWindowPredictor(
                    lambda l, r: fmodel.apply(fparams, l, r),
                    kernel_size=ft,
                    warm_window_fn=lambda l, r, f0: fmodel_warm.apply(
                        fparams, l, r, flow_init=f0
                    ),
                    fetch_uncertainty=False,
                )
                fvid = rng.integers(
                    0, 255, (ft, 2, fh, fw, 3)
                ).astype(np.uint8)
                fl, fr = jnp.asarray(fvid[:, 0]), jnp.asarray(fvid[:, 1])
                t0 = time.monotonic()
                # same transient-compile-flake retries as phases A/B
                # (observed: HTTP 500 from the remote compile service
                # killed phase C on the first r5 driver-style run)
                for attempt in range(3):
                    try:
                        fouts = fpred._run_window(fl, fr)
                        _sync(fouts)
                        break
                    except Exception as e:  # noqa: BLE001
                        msg = str(e)
                        transient = any(
                            s in msg for s in
                            ("remote_compile", "UNAVAILABLE", "INTERNAL")
                        )
                        if not transient or attempt == 2:
                            raise
                        _log(f"phase C compile flake (attempt "
                             f"{attempt + 1}): {msg.splitlines()[0][:120]}")
                        time.sleep(20)
                f_first = time.monotonic() - t0
                t0 = time.monotonic()
                fouts = fpred._run_window(fl, fr)
                _sync(fouts)
                f_dev = time.monotonic() - t0
                _log(f"phase C: strict full window {f_dev:.2f}s "
                     f"(first {f_first:.1f}s)")
                with _LOCK:
                    _BEST.update({
                        "full_first_window_s": round(f_first, 3),
                        "full_device_s_per_window": round(f_dev, 3),
                        # strict marginal rate = the e2e asymptote
                        # (stride new frames per window)
                        "full_device_only_fps": round(fstride / f_dev, 3),
                        "full_device_only_vs_baseline": _vs_baseline_range(
                            fstride / f_dev, "full", True
                        ),
                    })
                # warm window (sanctioned mode: stride = kernel, each
                # warm window contributes ft new frames)
                if _deadline_left(deadline_s) > 0.7 * f_first + 1.5 * f_dev:
                    f_warm = None
                    prev = fouts[0]
                    for _ in range(2):
                        t0 = time.monotonic()
                        wouts = fpred._run_window_warm(
                            fl, fr, prev, ft - fstride
                        )
                        _sync(wouts)
                        f_warm = min(f_warm or 1e9,
                                     time.monotonic() - t0)
                    _log(f"phase C: warm full window {f_warm:.2f}s")
                    with _LOCK:
                        _BEST.update({
                            "full_warm_device_s_per_window":
                                round(f_warm, 3),
                            "full_warm_fast_fps": round(ft / f_warm, 3),
                        })
                else:
                    _log("phase C: warm window skipped (deadline)")
            except Exception as e:  # noqa: BLE001 - phase C must never
                # cost the already-recorded short result
                _log(f"phase C failed (non-fatal): "
                     f"{type(e).__name__}: {str(e)[:160]}")
                with _LOCK:
                    _BEST["full_error"] = type(e).__name__

    with _LOCK:
        # a completed e2e value clears the partial flag; a device-only
        # record keeps it (value stays null — the flag explains why)
        if _BEST.get("value") is not None:
            _BEST.pop("partial", None)
        final_rec = dict(_BEST)
    # persist for the stale-fallback path ONLY on a full, healthy run of
    # a real config with a real e2e value (the tiny self-test and
    # device-only partials must not pollute the fallback)
    if config != "tiny" and final_rec.get("value") is not None:
        _save_last_good(
            {**final_rec, "measured_at": time.strftime("%Y-%m-%d")}
        )
    _emit(final=True)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the one-line contract
        # is unconditional: whatever killed the run, flush the best
        # record (or the stale fallback) before dying
        if not isinstance(e, SystemExit):
            _log(f"fatal: {type(e).__name__}: {str(e)[:200]}")
            with _LOCK:
                if _BEST and not _PRINTED.is_set():
                    _BEST["degraded"] = True
                    _BEST["error"] = f"{type(e).__name__}"
            _emit(final=False)
        raise
