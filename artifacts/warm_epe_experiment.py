"""Quantify the EPE/TEPE impact of the non-parity inference modes
(fast windows, warm start, warm+fast) against the strict-parity
protocol with SHARED trained weights.

No trained reference checkpoint exists in this environment, so this
trains PPMStereo briefly on procedural synthetic stereo (the loader's
dataset-free fallback) — enough signal that disparity predictions track
ground truth — then evaluates all four windowing modes on held-out
synthetic sequences. Run on the TPU; one process. Results are recorded
in BENCH_NOTES.md.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 160, 256
TRAIN_STEPS = 400
K, ITERS, WARM_ITERS = 10, 10, 5
EVAL_FRAMES, EVAL_SEQS = 40, 2


def main():
    from ppmstereo_tpu.data.datasets import SyntheticStereoDataset
    from ppmstereo_tpu.evaluation.metrics import eval_endpoint_error_sequence
    from ppmstereo_tpu.models.inference import SlidingWindowPredictor
    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
    from ppmstereo_tpu.train.trainer import TrainConfig, train

    cfg = TrainConfig(
        model_name="ppmstereo",
        num_steps=TRAIN_STEPS,
        batch_size=1,
        lr=4e-4,
        sample_len=5,
        train_iters=ITERS,
        crop_size=(H, W),
        mixed_precision=True,
        exp_dir="/tmp/warm_epe_exp",
        ckpt_after_steps=10**9,
        save_freq=10**9,
        eval_freq=10**9,
        num_workers=0,
        log_freq=50,
    )

    train_ds = SyntheticStereoDataset(
        num_seqs=8, sample_len=5, height=H, width=W, seed=0
    )

    class _Loader:
        def __iter__(self):
            i = 0
            while True:
                s = train_ds[i % len(train_ds.sample_list)]
                i += 1
                yield {
                    "left": s["img"][None, :, 0],
                    "right": s["img"][None, :, 1],
                    "disparity": s["disp"][None, :, 0],
                    "valid": s["valid"][None, :, 0],
                }

    t0 = time.perf_counter()
    state = train(cfg, loader=_Loader(), enable_eval=False)
    print(f"trained {TRAIN_STEPS} steps in {time.perf_counter() - t0:.0f}s",
          flush=True)
    params = jax.device_get(state.params)

    mcfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=mcfg, iters=ITERS, test_mode=True)
    model_warm = PPMStereo(cfg=mcfg, iters=WARM_ITERS, test_mode=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)

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

    for si in range(EVAL_SEQS):
        ds = SyntheticStereoDataset(
            num_seqs=1, sample_len=EVAL_FRAMES, height=H, width=W,
            seed=100 + si,
        )
        s = ds[0]
        video = s["img"]  # (T, 2, H, W, 3)
        gt = np.abs(s["disp"][:, 0])  # (T, H, W, 1) positive disparity
        valid = s["valid"][:, 0][..., None].astype(np.float32)

        for name, kw in modes.items():
            pred = SlidingWindowPredictor(window_fn, kernel_size=K, **kw)
            t0 = time.perf_counter()
            out = pred(video)
            dt = time.perf_counter() - t0
            m = eval_endpoint_error_sequence(
                jnp.asarray(out["disparity"]), jnp.asarray(gt),
                jnp.asarray(valid),
            )
            print(
                f"seq{si} {name:9s}: epe {float(m['epe_mean']):7.4f}  "
                f"tepe {float(m['temp_epe_mean']):7.4f}  "
                f"bad1px {float(m['epe_bad_1px']):5.2f}%  ({dt:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
