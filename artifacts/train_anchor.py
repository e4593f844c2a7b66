"""Mint the standing accuracy-anchor checkpoint (round 3).

No trained reference checkpoint exists in this environment (the
reference's value proposition is trained-checkpoint accuracy,
README.md:12-48), so this trains PPMStereo at the full shipped
architecture on the procedural synthetic mixture (64 sequences,
reference augmentation recipe) for 8k steps at the reference's exact
hyperparameters scaled to one 16 GB v5e: batch 1 (reference: 2/GPU),
lr 3e-4 OneCycle, 320x512 crops, sample_len 5, train_iters 10,
clip-norm 0.99, per-iteration remat, Pallas flash attention fwd+bwd.
Measured 1.78 s/step -> ~4 h.

Outputs:
  checkpoints/anchor_r3/ckpt/   Orbax train state (resume-capable)
  checkpoints/anchor_r3.npz     final params, f16, for the repo anchor
  checkpoints/anchor_r3/metrics.jsonl  loss/EPE curve

The checkpoint feeds: the warm/fast EPE table (artifacts/
anchor_epe_table.py), the test_warm_start budget assertion, and the
standing anchor EPE recorded in BENCH_NOTES.md.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

STEPS = int(os.environ.get("ANCHOR_STEPS", "8000"))
EXP_DIR = os.environ.get("ANCHOR_DIR", "/root/repo/checkpoints/anchor_r3")


def main():
    import jax

    from ppmstereo_tpu.train.trainer import TrainConfig, train

    cfg = TrainConfig(
        model_name="ppmstereo",
        num_steps=STEPS,
        batch_size=1,
        lr=3e-4,
        sample_len=5,
        train_iters=10,
        crop_size=(320, 512),
        mixed_precision=True,
        exp_dir=EXP_DIR,
        ckpt_after_steps=0,
        save_freq=int(os.environ.get("ANCHOR_SAVE_FREQ", "1000")),
        # uint8 image wire: bounds the axon client's per-transfer host
        # buffer retention (~26 MB/step observed) so an 8k-step run fits
        # in host RAM; quantization is sub-LSB post-augmentation.
        # ANCHOR_WIRE_UINT8=0 keeps the f32 wire (reuses the remote
        # compile cache of the original graph) — pair it with
        # ANCHOR_MAX_STEPS chunking + process restarts to bound the leak.
        wire_uint8=os.environ.get("ANCHOR_WIRE_UINT8", "1") == "1",
        eval_freq=10**9,
        # 0: inline data generation — one fewer failure mode (forked
        # DataLoader workers after the axon client's threads exist are
        # fork-unsafe), and synthetic generation is cheap next to the
        # ~2 s step.
        #
        # LIVENESS RULE (learned the hard way — a healthy resumed run
        # was killed at ~step 4200 after being misread as stalled):
        # /proc/<pid>/io rchar/wchar do NOT count gRPC sendmsg/recvmsg,
        # so the tunnel client looks io-idle while training at full
        # speed, and the uint8-graph recompile takes 20-40 min with no
        # output. The ONLY reliable liveness signals are the Orbax
        # checkpoint dir mtimes (save_freq steps) and metrics.jsonl
        # (flush gate fixed in logging_utils round 3). Wait at least
        # one save_freq interval past compile before assuming a stall.
        num_workers=0,
        log_freq=50,
    )

    max_steps = os.environ.get("ANCHOR_MAX_STEPS")
    t0 = time.perf_counter()
    state = train(
        cfg, enable_eval=False,
        max_steps=int(max_steps) if max_steps else None,
    )
    dt = time.perf_counter() - t0
    done = int(state.step)
    print(f"reached step {done} in {dt/3600:.2f} h", flush=True)
    if done < STEPS:
        print("partial run (ANCHOR_MAX_STEPS) — resume to continue; "
              "skipping npz export", flush=True)
        return

    # flat f16 npz for the standing repo anchor (Orbax keeps the full
    # f32 train state for resume)
    params = jax.device_get(state.params)
    flat = {}

    def flatten(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree).astype(np.float16)

    flatten("", params)
    out = EXP_DIR.rstrip("/") + ".npz"
    np.savez_compressed(out, **flat)
    size_mb = os.path.getsize(out) / 1e6
    print(f"saved {len(flat)} arrays to {out} ({size_mb:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
