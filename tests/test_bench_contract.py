"""bench.py survivability contract (VERDICT r3 item 1): the driver's
`python bench.py` must print exactly one parseable JSON metric line no
matter what the TPU tunnel does — watchdog deadline, external SIGTERM,
or a cold compile cache that never finishes. Round 3's driver bench
timed out with NO output (BENCH_r03.json rc=124 parsed=null); these
tests pin the machinery that prevents a repeat."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _cpu_env(**extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no 8-device forcing for subprocesses
    env.update(JAX_PLATFORMS="cpu", **extra)
    return env


def _parse_single_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines!r}"
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, f"missing {key!r} in {rec}"
    return rec


def test_watchdog_emits_fallback_line_before_any_measurement():
    """A deadline that fires before jax even finishes importing (the
    cold-cache 20-minute-compile scenario) must still produce a
    parseable line — the committed BENCH_LAST_GOOD.json, flagged."""
    p = subprocess.run(
        [sys.executable, BENCH],
        env=_cpu_env(BENCH_DEADLINE_S="2", BENCH_CONFIG="tiny"),
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert rec.get("degraded") is True
    assert rec.get("stale") is True  # nothing was measured
    assert rec["value"] > 0  # seeded from the last good driver run


def test_sigterm_emits_line(tmp_path):
    """An external `timeout`-style SIGTERM at any point must flush the
    best-so-far record (here: before any measurement -> stale path)."""
    ready = tmp_path / "ready"
    p = subprocess.Popen(
        [sys.executable, BENCH],
        env=_cpu_env(BENCH_DEADLINE_S="600", BENCH_CONFIG="tiny",
                     BENCH_READY_FILE=str(ready)),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO,
    )
    # wait until the handlers are installed (under heavy CPU contention
    # a fixed sleep could SIGTERM the interpreter mid-import, where the
    # default handler still applies and no output is possible)
    deadline = time.monotonic() + 120
    while not ready.exists():
        if time.monotonic() > deadline:
            p.kill()
            pytest.fail("bench never signalled readiness")
        time.sleep(0.2)
    p.send_signal(signal.SIGTERM)
    try:
        out, _ = p.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        p.kill()
        pytest.fail("bench did not exit after SIGTERM")
    rec = _parse_single_json_line(out)
    assert rec.get("degraded") is True


def test_device_only_partial_has_null_value():
    """Fixed value semantics (VERDICT r4 weak #2): when only phase A's
    single-window device measurement completed, `value` must be null —
    the device-side marginal rate lands in `device_only_fps` and is
    never promoted into the round-over-round e2e series."""
    p = subprocess.run(
        [sys.executable, BENCH],
        env=_cpu_env(BENCH_DEADLINE_S="1200", BENCH_CONFIG="tiny",
                     BENCH_STOP_AFTER_PHASE_A="1"),
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["partial"] == "device_only_single_window"
    assert rec["device_only_fps"] > 0
    assert rec["device_s_per_window"] > 0
    assert rec.get("degraded") is True


@pytest.mark.slow
def test_tiny_config_full_run():
    """The progressive-measurement path end-to-end on CPU: phase A
    (single window), phase B (e2e passes), phase C (full-config
    stand-in + warm window), clean exit, final record not flagged
    degraded, and the tiny run must NOT overwrite the committed
    last-good fallback."""
    before = open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read()
    p = subprocess.run(
        [sys.executable, BENCH],
        env=_cpu_env(BENCH_DEADLINE_S="2400", BENCH_CONFIG="tiny",
                     BENCH_N_WINDOWS="1"),
        capture_output=True, text=True, timeout=2500, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert "degraded" not in rec
    assert "partial" not in rec
    assert rec["value"] > 0 and rec["wall_s"] > 0
    assert rec["metric"].startswith("ppmstereo_tiny_")
    # device-only rate is its own field alongside the e2e value
    assert rec["device_only_fps"] > 0
    # tiny has no baseline range -> null (range is dict for real configs)
    assert rec["vs_baseline"] is None
    # phase C: the full-config stand-in numbers land in the same record
    assert rec["full_device_s_per_window"] > 0
    assert rec["full_device_only_fps"] > 0
    assert rec["full_warm_fast_fps"] > 0
    after = open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read()
    assert after == before


def test_vs_baseline_is_range_or_null():
    """vs_baseline is a {low,mid,high} range dict (VERDICT r4 weak #7)
    for strict real configs and null otherwise; low uses the most
    generous A100 estimate (the conservative claim)."""
    sys.path.insert(0, REPO)
    import bench

    r = bench._vs_baseline_range(8.0, "short", True)
    assert set(r) == {"low", "mid", "high"}
    assert r["low"] < r["mid"] < r["high"]
    lo, mid, hi = bench.A100_BASELINE_FPS_RANGE["short"]
    assert lo < mid < hi
    assert r["low"] == round(8.0 / hi, 3)
    assert bench._vs_baseline_range(8.0, "short", False) is None
    assert bench._vs_baseline_range(8.0, "tiny", True) is None
    assert bench._vs_baseline_range(0.0, "short", True) is None
