"""ICI comm-volume model for the mesh-sharded strict-parity window.

Compiles the sharded PPMStereo test-mode window at the REAL 720p/k20
protocol shape (736x1280 padded, T=20) over a virtual 8-device mesh
(seq=2 x space=4 by default) on the CPU backend — compile only, no
execution — and tallies every collective in the optimized HLO
(all-gather / all-reduce / collective-permute / all-to-all) with its
byte count, bucketed into scan-body (per refinement iteration) vs
once-per-window.

This turns the >=80%-scaling question into arithmetic: bytes/iteration
over ICI vs the 177 TFLOP/iteration play-attention floor (BENCH_NOTES
"Roofline argument"). Results recorded in BENCH_NOTES.md
("Sharded-window scaling model").

Usage: python artifacts/comm_model.py [SEQ SPACE [ITERS]]
"""
import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

SEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SPACE = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
T, H, W = 20, 736, 1280  # the padded 720p k20 protocol window

_B = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
      "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def shape_bytes(s: str) -> int:
    """'bf16[5,58880,128]{...}' or a tuple of shapes -> total bytes."""
    tot = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.groups()
        if dt not in _B:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * _B[dt]
    return tot


def tally(hlo: str):
    """-> (per_iter, per_window) dicts kind -> [count, bytes].

    XLA names scan-loop body computations 'region_*' / 'while*'; a
    collective inside one executes once per loop trip (= one PPM
    refinement iteration)."""
    comp = None
    per_iter, per_window, big = {}, {}, []
    for line in hlo.splitlines():
        m = re.match(r"^(%[\w\.\-_]+|ENTRY\s+\S+)\s*\(", line)
        if m:
            comp = m.group(1)
            continue
        m = re.search(
            r"=\s*((?:\([^=]*?\))|(?:\S+))\s+(all-gather|all-reduce|"
            r"collective-permute|all-to-all|reduce-scatter)\(", line)
        if not m:
            continue
        nbytes, kind = shape_bytes(m.group(1)), m.group(2)
        loop = comp is not None and (
            "region" in comp or "while" in comp or "body" in comp
        )
        bucket = per_iter if loop else per_window
        bucket.setdefault(kind, [0, 0])
        bucket[kind][0] += 1
        bucket[kind][1] += nbytes
        if nbytes > 100e6:
            big.append((nbytes, kind, comp, m.group(1)[:60]))
    return per_iter, per_window, big


def main():
    # RING=1: ring play attention (cfg.ring_attention) instead of the
    # picked-K/V all-gather — compare the per-iteration ICI bytes
    ring = os.environ.get("RING", "0") == "1"
    cfg = PPMStereoConfig(
        mixed_precision=True, use_cnet=True, ring_attention=ring
    )
    model = PPMStereo(cfg=cfg, iters=ITERS, test_mode=True)
    mesh = make_mesh(MeshSpec(data=1, seq=SEQ, space=SPACE), image_hw=(H, W))
    if ring:
        print("mode: RING play attention", flush=True)
    sh = NamedSharding(mesh, P(None, "seq", "space"))
    rep = NamedSharding(mesh, P())

    left = jax.ShapeDtypeStruct((1, T, H, W, 3), jnp.float32, sharding=sh)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 4, 64, 128, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 4, 64, 128, 3), jnp.float32),
    )
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), params
    )
    fn = jax.jit(model.apply, in_shardings=(
        jax.tree_util.tree_map(lambda _: rep, params), sh, sh))
    print(f"compiling sharded window T={T} {H}x{W} iters={ITERS} "
          f"mesh=(seq={SEQ},space={SPACE}) ...", flush=True)
    with mesh:  # ambient mesh: activates the model's bank-sharding hints
        hlo = fn.lower(params, left, left).compile().as_text()

    per_iter, per_window, big = tally(hlo)
    print("\nscan-body collectives (NB: summed over the three cascade "
          "stages; the 1/4-scale stage dominates):")
    tot_iter = 0
    for k, (c, v) in sorted(per_iter.items()):
        print(f"  {k:20s} x{c:4d}  {v/1e6:10.1f} MB")
        tot_iter += v
    print(f"  {'TOTAL':20s}        {tot_iter/1e6:10.1f} MB per iteration")
    tot_win = 0
    print("once-per-WINDOW collectives:")
    for k, (c, v) in sorted(per_window.items()):
        print(f"  {k:20s} x{c:4d}  {v/1e6:10.1f} MB")
        tot_win += v
    print(f"  {'TOTAL':20s}        {tot_win/1e6:10.1f} MB per window")
    print("\nlargest transfers:")
    for nbytes, kind, comp, shape in sorted(big, reverse=True)[:10]:
        print(f"  {nbytes/1e6:9.1f} MB  {kind:18s} {str(comp)[:42]:42s} {shape}")

    n = SEQ * SPACE
    compute_s = 33.4 / 20 / n  # measured single-chip window / iters / n chips
    # v5e ICI: ~100 GB/s effective per chip (conservative)
    #
    # CPU-backend dtype correction: the CPU XLA backend converts bf16 ->
    # f32 at graph entry and runs ALL collectives in f32 (verified with a
    # minimal bf16 WSC repro: `all-gather f32[...](wrapped_convert)`).
    # On TPU the same program gathers bf16 natively. Under
    # mixed_precision every dominant in-loop tensor (K/V banks,
    # selections, attention tokens) is bf16 — only flow (2ch) and
    # uncertainty (1ch) are f32, negligible — so the TPU-corrected
    # per-iteration byte count is ~the CPU tally halved.
    comm_s_raw = tot_iter / 100e9
    comm_s = comm_s_raw / 2
    frac = comm_s / (comm_s + compute_s)
    print(f"\nmodel @ n={n} v5e chips: compute {compute_s*1e3:.0f} ms/iter/chip;"
          f" comm {comm_s_raw*1e3:.1f} ms/iter CPU-raw-f32,"
          f" {comm_s*1e3:.1f} ms/iter TPU-bf16-corrected ->"
          f" {100*frac:.1f}% of the step if unoverlapped;"
          f" projected scaling efficiency >= {100*(1-frac):.0f}%")


if __name__ == "__main__":
    main()
