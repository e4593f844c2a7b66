"""Profiling + roofline accounting.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars only).
First-class here:
  * `trace(...)`: context manager around jax.profiler (XPlane dumps
    viewable in TensorBoard / Perfetto);
  * `timed(...)`: wall-clock timing with proper device sync;
  * `roofline(...)`: analytic FLOPs/bytes for the framework's hot ops to
    compare measured step time against the v5e envelope.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

# TPU v5e per-chip peaks
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, results: dict | None = None):
    t0 = time.perf_counter()
    yield
    # caller must block on outputs before exiting the context for accuracy
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    else:
        print(f"[timed] {name}: {dt*1e3:.2f} ms")


@dataclass
class OpCost:
    flops: float
    bytes: float

    @property
    def compute_s(self) -> float:
        return self.flops / V5E_BF16_FLOPS

    @property
    def memory_s(self) -> float:
        return self.bytes / V5E_HBM_BYTES_S

    @property
    def bound(self) -> str:
        return "compute" if self.compute_s > self.memory_s else "memory"

    @property
    def light_speed_s(self) -> float:
        return max(self.compute_s, self.memory_s)


def corr_volume_cost(b, h, w1, w2, c, bytes_per=2) -> OpCost:
    return OpCost(
        flops=2.0 * b * h * w1 * w2 * c,
        bytes=bytes_per * b * h * (w1 * c + w2 * c + w1 * w2 * 2),
    )


def corr_lookup_cost(b, h, w1, w2, taps=36, bytes_per=4) -> OpCost:
    # one-hot masked reduction: compare+select+mul+add over W2 per tap
    levels_scale = 1.875  # sum of W2/2^i over 4 levels
    return OpCost(
        flops=4.0 * b * h * w1 * w2 * taps / 4 * levels_scale,
        bytes=bytes_per * b * h * (w1 * w2 * levels_scale + w1 * taps),
    )


def play_attention_cost(b, t, hw, k, c, bytes_per=2) -> OpCost:
    lk = k * hw
    return OpCost(
        flops=4.0 * b * t * hw * lk * c,
        bytes=bytes_per * b * t * (hw * c * 2 + 2 * lk * c),
    )


def gru3d_cost(b, t, h, w, hidden, inp, taps=45, bytes_per=2) -> OpCost:
    # 9 separable convs over (t,h,w); taps ~ total kernel footprint
    cin = hidden + inp
    return OpCost(
        flops=2.0 * b * t * h * w * hidden * cin * taps / 9,
        bytes=bytes_per * b * t * h * w * (cin + hidden) * 9,
    )


def ppm_iteration_cost(b, t, h, w, c=128, top_k=5) -> OpCost:
    """One pick-and-play iteration at one scale (per SURVEY §3.1)."""
    costs = [
        corr_lookup_cost(b * t, h, w, w),
        play_attention_cost(b, t, h * w, top_k, c),
        gru3d_cost(b, t, h, w, c, 256 + 1),
    ]
    return OpCost(sum(x.flops for x in costs), sum(x.bytes for x in costs))
