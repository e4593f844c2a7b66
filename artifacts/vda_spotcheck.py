"""Real-weights Video-Depth-Anything import + parity spot-check.

No trained `vpt_vits.pth` exists in this environment, so VDA parity is
pinned on random weights only (tests/test_vda_parity.py). The moment a
real checkpoint IS available, this script turns accuracy validation into
one command instead of new engineering (round-3 VERDICT item 8):

    python artifacts/vda_spotcheck.py /path/to/vpt_vits.pth [--no-torch]

It (1) loads the torch state dict, (2) imports it through the full
vda_mapping into the flax VideoDepthAnything, asserting LOSSLESS coverage
(no missing flax params, no unmapped live reference tensors), (3) runs
the imported model on a deterministic synthetic clip and prints feature
statistics, and (4) unless --no-torch, builds the torch reference
(/root/reference/models/video_depth_anything/video_depth.py:37-162),
loads the same checkpoint, and prints elementwise parity diagnostics
(mean/max rel err, correlation) between the two forward passes — the
same contract the random-weights parity test enforces at <2e-2 rel err.

CPU-only (never touches the TPU tunnel).
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, T, H, W = 1, 2, 56, 84  # /14 multiples; exercises pos-embed interp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="path to vpt_vits.pth (torch state dict)")
    ap.add_argument(
        "--encoder", default="vits", help="DINOv2 size tag (default vits)"
    )
    ap.add_argument(
        "--no-torch", action="store_true",
        help="skip the torch-reference forward (import+stats only)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ppmstereo_tpu.nn.vda.video_depth import VideoDepthAnything
    from ppmstereo_tpu.utils.torch_import import (
        import_by_mapping,
        load_state_dict,
    )
    from ppmstereo_tpu.utils.vda_mapping import (
        is_vda_dead_key,
        vda_mapping,
        vda_transform,
    )

    print(f"loading {args.ckpt} ...", flush=True)
    sd = load_state_dict(args.ckpt)
    print(f"  {len(sd)} tensors")

    model = VideoDepthAnything(encoder=args.encoder)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    mapping = vda_mapping(encoder=args.encoder)
    params, missing = import_by_mapping(
        sd, variables["params"], mapping, transform=vda_transform
    )
    unmapped = sorted(
        k for k in set(sd) - set(mapping) if not is_vda_dead_key(k, mapping)
    )
    print(f"import coverage: missing flax params = {len(missing)}, "
          f"unmapped live reference tensors = {len(unmapped)}")
    for k in missing[:10]:
        print(f"  MISSING {k}")
    for k in unmapped[:10]:
        print(f"  UNMAPPED {k}")
    if missing or unmapped:
        print("FAIL: import is not lossless")
        return 1

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    print(f"jax features: shape={got.shape} mean={got.mean():.5f} "
          f"std={got.std():.5f} finite={np.isfinite(got).all()}")

    if args.no_torch:
        print("OK (import + forward; torch comparison skipped)")
        return 0

    # ---- torch reference forward on the same clip --------------------
    import importlib

    from tests import reference_stubs

    reference_stubs.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    vd = importlib.import_module("models.video_depth_anything.video_depth")
    ref = vd.VideoDepthAnything(
        encoder=args.encoder, features=64, out_channels=[48, 96, 192, 384]
    )
    raw = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    raw = {k.removeprefix("module."): v for k, v in raw.items()}
    res = ref.load_state_dict(raw, strict=False)
    print(f"torch load: {len(res.missing_keys)} missing, "
          f"{len(res.unexpected_keys)} unexpected")
    ref.eval()

    tx = torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()
    with torch.no_grad():
        # the coherent sub-path (the vendored forward() is un-runnable as
        # shipped — video_depth.py:60-66 vs stereoanyvideo_extractor.py:258)
        feats = ref.pretrained.get_intermediate_layers(
            tx.flatten(0, 1), ref.intermediate_layer_idx[args.encoder],
            return_class_token=True,
        )
        out = ref.head(feats, H // 14, W // 14, T)
    want = out.permute(0, 2, 3, 1).numpy().reshape(got.shape)

    err = np.abs(got - want)
    scale = np.abs(want).mean() + 1e-8
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    print(f"parity: mean rel err = {err.mean() / scale:.5f}, "
          f"max abs err = {err.max():.5f}, corr = {corr:.6f}")
    ok = err.mean() / scale < 2e-2 and corr > 0.999
    print("OK" if ok else "FAIL: exceeds the random-weights parity budget")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
