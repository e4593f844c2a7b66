"""Export the anchor npz from the latest Orbax train-state checkpoint.

Normally artifacts/train_anchor.py exports after its final step; this
standalone path mints the npz from whatever checkpoint exists (e.g. when
a run is cut short by tunnel stalls). CPU-only — never touches the TPU.

    python artifacts/export_anchor_npz.py [ckpt_dir] [out.npz]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
    from ppmstereo_tpu.train.checkpoints import CheckpointManager
    from ppmstereo_tpu.train.state import create_train_state

    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "checkpoints", "anchor_r3", "ckpt"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "checkpoints", "anchor_r3.npz"
    )

    # abstract state with the anchor architecture (must match training:
    # artifacts/train_anchor.py — defaults + mixed_precision)
    cfg = PPMStereoConfig(mixed_precision=True, use_cnet=True)
    model = PPMStereo(cfg=cfg, iters=10, test_mode=False)
    zeros = jnp.zeros((1, 5, 64, 128, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    state = create_train_state(model, params, num_steps=8000)

    mgr = CheckpointManager(ckpt_dir)
    restored, step = mgr.restore(state)
    assert restored is not None, f"no checkpoint under {ckpt_dir}"
    print(f"restored step {step} from {ckpt_dir}")

    flat = {}

    def flatten(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree).astype(np.float16)

    flatten("", jax.device_get(restored.params))
    np.savez_compressed(out, **flat)
    print(f"saved {len(flat)} arrays ({step} steps) to {out} "
          f"({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
