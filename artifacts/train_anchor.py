"""Mint / deepen the standing accuracy-anchor checkpoint.

No trained reference checkpoint exists in this environment (the
reference's value proposition is trained-checkpoint accuracy,
README.md:12-48), so this trains PPMStereo at the full shipped
architecture on the procedural synthetic mixture (64 sequences,
reference augmentation recipe) at the reference's exact hyperparameters
scaled to one 16 GB v5e: batch 1 (reference: 2/GPU), lr 3e-4 OneCycle,
320x512 crops, sample_len 5, train_iters 10, clip-norm 0.99,
per-iteration remat, Pallas flash attention fwd+bwd. ~1.8-2 s/step.

Round-5 recycle-proofing (VERDICT r4 item 4 — the r3 Orbax train state
died with a container recycle because the npz export only ran at queue
drain):

  * SEED: when no Orbax state exists to resume, params seed from
    ANCHOR_SEED_NPZ (default: the committed 5k-step anchor_r3.npz) —
    a warm restart with a fresh optimizer/schedule over ANCHOR_STEPS.
  * EXPORT EVERY SAVE: a save_callback exports the f16 npz (atomic
    rename) + a JSON sidecar with effective-step bookkeeping every
    save_freq (default 1000) steps, to a NON-gitignored path — so the
    driver's end-of-round auto-commit preserves the latest weights even
    if this session dies mid-run.

Outputs:
  checkpoints/anchor_r5/ckpt/   Orbax train state (resume; gitignored)
  checkpoints/anchor_r5.npz     rolling params export, f16 (committed)
  checkpoints/anchor_r5.json    {run_steps, seed_steps, effective_steps}
  checkpoints/anchor_r5/metrics.jsonl  loss/EPE curve

The checkpoint feeds: the warm/fast EPE table (artifacts/
anchor_epe_table.py ANCHOR_NPZ=...), the test_warm_start budget
assertion, and EPE_rNN.json.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

STEPS = int(os.environ.get("ANCHOR_STEPS", "10000"))
EXP_DIR = os.environ.get("ANCHOR_DIR", "/root/repo/checkpoints/anchor_r5")
SEED_NPZ = os.environ.get(
    "ANCHOR_SEED_NPZ", "/root/repo/checkpoints/anchor_r3.npz"
)
# steps already baked into the seed npz (anchor_r3 = 5000); effective
# anchor depth = seed steps + this run's steps
SEED_STEPS = int(os.environ.get("ANCHOR_SEED_STEPS", "5000"))


def _flatten_params(params) -> dict:
    flat = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree).astype(np.float16)

    rec("", params)
    return flat


def export_npz(params, run_steps: int):
    """Atomic npz + sidecar export (the recycle-proof rolling anchor)."""
    out = EXP_DIR.rstrip("/") + ".npz"
    flat = _flatten_params(params)
    tmp = out + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, out)
    meta = {
        "run_steps": int(run_steps),
        "seed_steps": SEED_STEPS if SEED_NPZ and os.path.exists(SEED_NPZ) else 0,
        "effective_steps": int(run_steps)
        + (SEED_STEPS if SEED_NPZ and os.path.exists(SEED_NPZ) else 0),
        "seed_npz": SEED_NPZ,
        "exported_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "size_mb": round(os.path.getsize(out) / 1e6, 1),
    }
    with open(EXP_DIR.rstrip("/") + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {out} at run step {run_steps} "
          f"(effective {meta['effective_steps']})", flush=True)


def main():
    import jax

    from ppmstereo_tpu.train.trainer import TrainConfig, train

    cfg = TrainConfig(
        model_name="ppmstereo",
        num_steps=STEPS,
        batch_size=1,
        lr=float(os.environ.get("ANCHOR_LR", "3e-4")),
        sample_len=5,
        train_iters=10,
        crop_size=(320, 512),
        mixed_precision=True,
        exp_dir=EXP_DIR,
        ckpt_after_steps=0,
        save_freq=int(os.environ.get("ANCHOR_SAVE_FREQ", "1000")),
        # uint8 image wire: bounds the axon client's per-transfer host
        # buffer retention (~26 MB/step observed) so a long run fits in
        # host RAM; quantization is sub-LSB post-augmentation.
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
        # speed, and a fresh-graph compile takes 20-40 min with no
        # output. The ONLY reliable liveness signals are the Orbax
        # checkpoint dir mtimes (save_freq steps) and metrics.jsonl.
        # Wait at least one save_freq interval past compile before
        # assuming a stall.
        num_workers=0,
        log_freq=50,
    )

    # seed params from the committed npz ONLY when there is no Orbax
    # state to resume (train() prefers the Orbax restore)
    init_params = None
    has_orbax = os.path.isdir(os.path.join(EXP_DIR, "ckpt")) and any(
        os.scandir(os.path.join(EXP_DIR, "ckpt"))
    )
    if not has_orbax and SEED_NPZ and os.path.exists(SEED_NPZ):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from anchor_epe_table import load_anchor_params

        import jax.numpy as jnp

        init_params = jax.tree_util.tree_map(
            jnp.asarray, load_anchor_params(SEED_NPZ)
        )
        print(f"seeding params from {SEED_NPZ} (+{SEED_STEPS} baked steps)",
              flush=True)

    max_steps = os.environ.get("ANCHOR_MAX_STEPS")
    t0 = time.perf_counter()
    state = train(
        cfg, enable_eval=False,
        max_steps=int(max_steps) if max_steps else None,
        init_params=init_params,
        save_callback=lambda step, host_state: export_npz(
            host_state.params, step
        ),
    )
    dt = time.perf_counter() - t0
    done = int(state.step)
    print(f"reached run step {done} in {dt/3600:.2f} h", flush=True)
    export_npz(jax.device_get(state.params), done)


if __name__ == "__main__":
    main()
