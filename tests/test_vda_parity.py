"""Parity for the Video-Depth-Anything stack (DINOv2 ViT-S + DPT-temporal
head + motion modules) vs the torch reference
(/root/reference/models/video_depth_anything/), random weights through
the checkpoint-import mapping. Unblocks real vpt_vits.pth checkpoints
for StereoAnyVideo and PPMStereo_VDA.
"""

import importlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import reference_stubs

B, T = 1, 2
H, W = 56, 84  # /14 multiples; (4, 6) patch grid exercises pos-embed interp


def _install_reference():
    reference_stubs.install()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def test_pos_embed_interpolation_matches_torch():
    """Torch-exact bicubic pos-embed interpolation incl. the DINOv2 0.1
    scale-factor offset (reference dinov2.py:179-211)."""
    import torch
    import torch.nn.functional as F

    from ppmstereo_tpu.nn.vda.dinov2 import interpolate_pos_embed

    rng = np.random.default_rng(0)
    grid, dim = 37, 16
    pe = rng.normal(size=(1, grid, grid, dim)).astype(np.float32)

    for ph, pw in ((4, 6), (23, 17), (37, 11)):
        sx = (ph + 0.1) / grid
        sy = (pw + 0.1) / grid
        want = F.interpolate(
            torch.from_numpy(pe).permute(0, 3, 1, 2),
            scale_factor=(sx, sy), mode="bicubic", antialias=False,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(interpolate_pos_embed(jnp.asarray(pe), ph, pw, grid))
        assert got.shape == want.shape, (got.shape, want.shape)
        assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


@pytest.mark.slow
def test_vda_depth_features_parity():
    """Full VDA feature path: DINOv2 intermediate layers (+final norm) ->
    DPT-temporal head -> 32-ch map at (ph*14, pw*14)."""
    _install_reference()
    import torch

    vd = importlib.import_module("models.video_depth_anything.video_depth")

    torch.manual_seed(0)
    ref = vd.VideoDepthAnything(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384]
    )
    ref.eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)  # pre-normalized
    tx = torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()

    with torch.no_grad():
        # call the coherent sub-path directly: the vendored forward()'s
        # 7/8 pre-resize + signature clash with its own DepthExtractor
        # call site make it un-runnable as shipped (video_depth.py:60-66
        # vs stereoanyvideo_extractor.py:258); SURVEY.md §2.9
        feats = ref.pretrained.get_intermediate_layers(
            tx.flatten(0, 1), ref.intermediate_layer_idx["vits"],
            return_class_token=True,
        )
        out = ref.head(feats, H // 14, W // 14, T)
    want = out.permute(0, 2, 3, 1).numpy()  # (B*T, h, w, 32)

    from ppmstereo_tpu.nn.vda.video_depth import VideoDepthAnything
    from ppmstereo_tpu.utils.torch_import import import_by_mapping
    from ppmstereo_tpu.utils.vda_mapping import (
        is_vda_dead_key,
        vda_mapping,
        vda_transform,
    )

    model = VideoDepthAnything(encoder="vits")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapping = vda_mapping()
    new_inner, missing = import_by_mapping(
        sd, variables["params"], mapping, transform=vda_transform
    )
    unmapped = sorted(k for k in set(sd) - set(mapping) if not is_vda_dead_key(k, mapping))
    assert not missing, f"missing: {missing[:10]}"
    assert not unmapped, f"unmapped reference tensors: {unmapped[:10]}"

    got = np.asarray(model.apply({"params": new_inner}, jnp.asarray(x)))
    got = got.reshape(want.shape)
    err = np.abs(got - want)
    scale = np.abs(want).mean() + 1e-8
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert err.mean() / scale < 2e-2, f"rel err {err.mean() / scale} (max {err.max()})"
    assert corr > 0.999, f"correlation {corr}"
