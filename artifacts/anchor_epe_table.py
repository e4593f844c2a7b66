"""Regenerate the windowing-mode EPE table with the REAL anchor
checkpoint (round-3 VERDICT item 3a).

Replaces artifacts/warm_epe_experiment.py's 400-step/2-sequence version:
loads the standing anchor (checkpoints/anchor_r3.npz — 5k steps at the
reference hyperparameters, artifacts/train_anchor.py) and evaluates all
four windowing modes on >= 10 held-out synthetic sequences at the
training resolution. The strict-parity row is the STANDING ACCURACY
ANCHOR recorded in BENCH_NOTES.md — regressions across rounds show up
as a higher strict EPE with the same checkpoint + seeds.

Run on the TPU (one process):  python artifacts/anchor_epe_table.py
CPU smoke (tiny):              ANCHOR_EVAL_SEQS=1 ANCHOR_EVAL_FRAMES=8 \
                               ANCHOR_HW=96x128 python ... --platform cpu
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHOR = os.environ.get(
    "ANCHOR_NPZ", os.path.join(REPO, "checkpoints", "anchor_r3.npz")
)
H, W = (int(s) for s in os.environ.get("ANCHOR_HW", "320x512").split("x"))
K, ITERS, WARM_ITERS = 10, 10, 5
EVAL_FRAMES = int(os.environ.get("ANCHOR_EVAL_FRAMES", "40"))
EVAL_SEQS = int(os.environ.get("ANCHOR_EVAL_SEQS", "10"))


def load_anchor_params(path: str):
    """Flat 'a/b/c' f16 npz -> nested f32 variables dict."""
    flat = np.load(path)
    tree: dict = {}
    for k in flat.files:
        parts = k.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = flat[k].astype(np.float32)
    if "params" not in tree:
        tree = {"params": tree}
    return tree


def main():
    if "--platform" in sys.argv:
        import jax

        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
        )
    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.data.datasets import SyntheticStereoDataset
    from ppmstereo_tpu.evaluation.metrics import eval_endpoint_error_sequence
    from ppmstereo_tpu.models.inference import SlidingWindowPredictor
    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

    params = jax.tree_util.tree_map(
        jnp.asarray, load_anchor_params(ANCHOR)
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"anchor {ANCHOR}: {n/1e6:.1f}M params", flush=True)

    mcfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=mcfg, iters=ITERS, test_mode=True)
    model_warm = PPMStereo(cfg=mcfg, iters=WARM_ITERS, test_mode=True)

    def window_fn(l, r):
        return model.apply(params, l, r)

    def warm_fn(l, r, fi):
        return model_warm.apply(params, l, r, flow_init=fi)

    modes = {
        "strict": dict(),
        "fast": dict(fast_mode=True),
        "warm": dict(warm_window_fn=warm_fn),
        "warm+fast": dict(fast_mode=True, warm_window_fn=warm_fn),
    }
    preds = {
        name: SlidingWindowPredictor(
            window_fn, kernel_size=K, fetch_uncertainty=False, **kw
        )
        for name, kw in modes.items()
    }

    sums = {name: {} for name in modes}
    weights = {name: 0.0 for name in modes}
    for si in range(EVAL_SEQS):
        ds = SyntheticStereoDataset(
            num_seqs=1, sample_len=EVAL_FRAMES, height=H, width=W,
            seed=100 + si,  # same held-out seeds as warm_epe_experiment
        )
        s = ds[0]
        video = s["img"]
        gt = np.abs(s["disp"][:, 0])
        valid = s["valid"][:, 0][..., None].astype(np.float32)

        for name, pred in preds.items():
            t0 = time.perf_counter()
            out = pred(video)
            dt = time.perf_counter() - t0
            m = eval_endpoint_error_sequence(
                jnp.asarray(out["disparity"]), jnp.asarray(gt),
                jnp.asarray(valid),
            )
            seq_len = len(out["disparity"])
            for k_, v in m.items():
                sums[name][k_] = sums[name].get(k_, 0.0) + float(v) * seq_len
            weights[name] += seq_len
            print(
                f"seq{si:02d} {name:9s}: epe {float(m['epe_mean']):7.4f}  "
                f"tepe {float(m['temp_epe_mean']):7.4f}  "
                f"bad1px {float(m['epe_bad_1px']):5.2f}%  ({dt:.1f}s)",
                flush=True,
            )

    table = {}
    print(f"\n=== aggregated over {EVAL_SEQS} sequences "
          f"({H}x{W}, {EVAL_FRAMES} frames, k{K}/i{ITERS}/warm-i{WARM_ITERS}) ===")
    strict_epe = sums["strict"]["epe_mean"] / weights["strict"]
    strict_tepe = sums["strict"]["temp_epe_mean"] / weights["strict"]
    for name in modes:
        epe = sums[name]["epe_mean"] / weights[name]
        tepe = sums[name]["temp_epe_mean"] / weights[name]
        bad1 = sums[name]["epe_bad_1px"] / weights[name]
        table[name] = {"epe": epe, "tepe": tepe, "bad1px": bad1}
        print(f"{name:9s}: epe {epe:7.4f} ({100*(epe/strict_epe-1):+5.1f}%)  "
              f"tepe {tepe:7.4f} ({100*(tepe/strict_tepe-1):+5.1f}%)  "
              f"bad1px {bad1:5.2f}%", flush=True)

    record = {
        "anchor": ANCHOR,
        "anchor_steps": os.environ.get("ANCHOR_STEPS_LABEL"),
        "hw": [H, W], "frames": EVAL_FRAMES,
        "seqs": EVAL_SEQS, "k": K, "iters": ITERS,
        "warm_iters": WARM_ITERS, "table": table,
    }
    out_path = os.path.join(REPO, "checkpoints", "anchor_epe_table.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"-> {out_path}")
    # per-round accuracy artifact next to BENCH_rNN.json (VERDICT r3
    # item 5): accuracy regressions become as visible round-over-round
    # as perf ones
    epe_out = os.environ.get("EPE_OUT")
    if epe_out:
        with open(epe_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"-> {epe_out}")


if __name__ == "__main__":
    main()
