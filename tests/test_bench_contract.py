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


@pytest.mark.slow
def test_tiny_config_full_run():
    """The progressive-measurement path end-to-end on CPU: phase A
    (single window) then phase B (e2e passes), clean exit, final record
    not flagged degraded, and the tiny run must NOT overwrite the
    committed last-good fallback."""
    before = open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read()
    p = subprocess.run(
        [sys.executable, BENCH],
        env=_cpu_env(BENCH_DEADLINE_S="1200", BENCH_CONFIG="tiny",
                     BENCH_N_WINDOWS="1"),
        capture_output=True, text=True, timeout=1300, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert "degraded" not in rec
    assert "partial" not in rec
    assert rec["value"] > 0 and rec["wall_s"] > 0
    assert rec["metric"].startswith("ppmstereo_tiny_")
    after = open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read()
    assert after == before
