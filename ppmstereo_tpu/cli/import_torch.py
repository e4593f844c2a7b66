"""One-command trained-weights intake: torch reference checkpoint -> npz.

When reference checkpoints materialize (README.md:12-48 links them; none
exist in this environment), this is the zero-new-code path to trained-
weights accuracy parity (VERDICT r4 item 8):

    python -m ppmstereo_tpu.cli.import_torch ckpt.pth out.npz
    python -m ppmstereo_tpu.cli.evaluate --platform tpu \\
        MODEL.model_name=PPMStereoModel MODEL.checkpoint=out.npz \\
        dataset_name=dynamicreplica

It runs the existing parity-suite machinery on a real state-dict file:
utils/torch_import.py::load_state_dict (with the reference's
'model'/'state_dict'/'module.' unwrapping, ppm_stereo_model.py:35-41),
the per-family key mappings (utils/ppm_mapping.py, utils/zoo_mappings.py
— the same tables the torch-parity tests pin to <0.1 px), and writes the
flat f16 npz format every weights consumer here understands
(train/checkpoints.py::load_params_npz, artifacts/anchor_epe_table.py,
MODEL.checkpoint=...npz).

Exit code is non-zero when mapped keys are missing from the checkpoint
or live reference tensors have no flax destination — a conversion that
silently dropped weights would poison the parity claim.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _build_and_map(args, sd):
    """Returns (variables_with_imported_params, missing, unmapped)."""
    import jax
    import jax.numpy as jnp

    from ppmstereo_tpu.utils.torch_import import import_by_mapping

    at = args.attention_type
    model_name = args.model

    if model_name == "PPMStereoModel":
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
        from ppmstereo_tpu.utils.ppm_mapping import (
            grn_transform,
            is_dead_reference_key,
            ppmstereo_mapping,
        )

        # size the learned time embedding from the checkpoint itself
        nf = args.num_frames
        if nf is None and "time_embed" in sd:
            nf = sd["time_embed"].shape[1]
        nf = nf or 5
        cfg = PPMStereoConfig(
            mixed_precision=False, use_cnet=not args.no_cnet,
            attention_type=at, num_frames=nf, force_xla_attention=True,
        )
        model = PPMStereo(cfg=cfg, iters=2, test_mode=True)
        mapping = ppmstereo_mapping(
            attention_type=at, use_cnet=not args.no_cnet
        )
        transform, dead = grn_transform, is_dead_reference_key
    elif model_name == "PPMStereoVDAModel":
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
        from ppmstereo_tpu.utils.ppm_mapping import grn_transform
        from ppmstereo_tpu.utils.zoo_mappings import (
            is_zoo_dead_key,
            ppmstereo_vda_mapping,
        )

        nf = args.num_frames
        if nf is None and "time_embed" in sd:
            nf = sd["time_embed"].shape[1]
        cfg = PPMStereoConfig(
            mixed_precision=False, use_cnet=True, use_vfm=True,
            attention_type=at, num_frames=nf or 5,
            force_xla_attention=True,
        )
        model = PPMStereo(cfg=cfg, iters=2, test_mode=True)
        mapping = ppmstereo_vda_mapping(attention_type=at)
        transform, dead = grn_transform, is_zoo_dead_key
    elif model_name == "DynamicStereoModel":
        from ppmstereo_tpu.models.dynamic_stereo import (
            DynamicStereo,
            DynamicStereoConfig,
        )
        from ppmstereo_tpu.utils.ppm_mapping import grn_transform
        from ppmstereo_tpu.utils.zoo_mappings import (
            dynamicstereo_mapping,
            is_zoo_dead_key,
        )

        nf = args.num_frames
        if nf is None and "time_embed" in sd:
            nf = sd["time_embed"].shape[1]
        cfg = DynamicStereoConfig(
            mixed_precision=False, num_frames=nf or 5,
            force_xla_attention=True,
        )
        model = DynamicStereo(cfg=cfg, iters=2, test_mode=True)
        mapping = dynamicstereo_mapping()
        transform, dead = grn_transform, is_zoo_dead_key
    elif model_name == "BiDAStereoModel":
        from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig
        from ppmstereo_tpu.utils.ppm_mapping import grn_transform
        from ppmstereo_tpu.utils.zoo_mappings import (
            bidastereo_mapping,
            is_zoo_dead_key,
        )

        cfg = BiDAStereoConfig(
            mixed_precision=False, force_xla_attention=True
        )
        model = BiDAStereo(cfg=cfg, iters=2, test_mode=True)
        mapping = bidastereo_mapping(include_raft="raft.fnet.conv1.weight" in sd)
        transform, dead = grn_transform, is_zoo_dead_key
    elif model_name == "StereoAnyVideoModel":
        from ppmstereo_tpu.models.stereoanyvideo import (
            StereoAnyVideo,
            StereoAnyVideoConfig,
        )
        from ppmstereo_tpu.utils.ppm_mapping import grn_transform
        from ppmstereo_tpu.utils.zoo_mappings import (
            is_zoo_dead_key,
            stereoanyvideo_mapping,
        )

        cfg = StereoAnyVideoConfig(mixed_precision=False)
        model = StereoAnyVideo(cfg=cfg, iters=2, test_mode=True)
        mapping = stereoanyvideo_mapping(
            include_vda=any(k.startswith("backbone.") for k in sd)
        )
        transform, dead = grn_transform, is_zoo_dead_key
    else:
        raise SystemExit(f"unsupported model {model_name!r}")

    zeros = jnp.zeros((1, args.num_frames or 4, 64, 96, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    new_inner, missing = import_by_mapping(
        sd, params["params"], mapping, transform=transform
    )
    unmapped = sorted(
        k for k in set(sd) - set(mapping) if not dead(k, mapping)
    )
    return {"params": new_inner}, missing, unmapped


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a torch reference checkpoint to the flax npz"
    )
    p.add_argument("ckpt", help=".pth state dict (or .npz of numpy arrays)")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--model", default="PPMStereoModel",
                   choices=["PPMStereoModel", "PPMStereoVDAModel",
                            "DynamicStereoModel", "BiDAStereoModel",
                            "StereoAnyVideoModel"])
    p.add_argument("--attention_type",
                   default="self_stereo_temporal_update_time_update_space",
                   help="reference architecture switch (train.py:425-447)")
    p.add_argument("--no_cnet", action="store_true",
                   help="checkpoint trained without the ConvNeXt cnet")
    p.add_argument("--num_frames", type=int, default=None,
                   help="time-embed length; default: read from checkpoint")
    p.add_argument("--platform", default="cpu",
                   help="jax platform for the shape-template init")
    p.add_argument("--allow_partial", action="store_true",
                   help="exit 0 even with missing/unmapped keys")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)

    from ppmstereo_tpu.utils.torch_import import load_state_dict

    sd = load_state_dict(args.ckpt)
    print(f"loaded {len(sd)} tensors from {args.ckpt}", flush=True)

    variables, missing, unmapped = _build_and_map(args, sd)

    flat = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree).astype(np.float16)

    rec("", variables["params"])
    np.savez_compressed(args.out, **flat)
    import os

    print(f"wrote {len(flat)} arrays to {args.out} "
          f"({os.path.getsize(args.out)/1e6:.1f} MB)", flush=True)
    if missing:
        print(f"MISSING from checkpoint ({len(missing)}): {missing[:10]}",
              flush=True)
    if unmapped:
        print(f"UNMAPPED live reference tensors ({len(unmapped)}): "
              f"{unmapped[:10]}", flush=True)
    print(
        "evaluate with:\n"
        f"  python -m ppmstereo_tpu.cli.evaluate MODEL.model_name={args.model} "
        f"MODEL.checkpoint={args.out} dataset_name=dynamicreplica",
        flush=True,
    )
    if (missing or unmapped) and not args.allow_partial:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
