"""Video-Depth-Anything assembly + the stereo-model adapters.

Re-design of /root/reference/models/video_depth_anything/video_depth.py
(VideoDepthAnything) and the adapters that feed its features into the
stereo models:

  * `VideoDepthAnything.depth_features`: DINOv2 intermediate layers ->
    DPT-temporal head -> (B, T, ~H, ~W, features//2) feature map.
  * `VideoDepthAnything.pyramid_features`: the 4 projected/resized layer
    maps, for MultiLevelEncoder_VFM fusion (PPMStereo_VDA). NOTE: the
    reference's two VDA call sites disagree with the vendored forward
    signature (stereoanyvideo_extractor.py:258 passes one arg;
    ppmstereo_VDA.py:619 expects a feature *list*); this module defines
    the coherent contract both consumers need.
  * `DepthExtractor`: resize to /14 multiples, run VDA, resize back,
    4x4-stride-4 conv -> (B, T, H/4, W/4, 32)
    (stereoanyvideo_extractor.py:238-287).

The backbone is frozen in every reference use; freezing here is via
stop_gradient + the optimizer param partition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.vda.dinov2 import DINOv2, intermediate_layer_idx, embed_dim
from ppmstereo_tpu.nn.vda.dpt import DPTHeadTemporal


_MODEL_CONFIGS = {
    "vits": {"features": 64, "out_channels": (48, 96, 192, 384)},
    "vitl": {"features": 256, "out_channels": (256, 512, 1024, 1024)},
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VideoDepthAnything(nn.Module):
    encoder: str = "vits"
    num_frames: int = 32
    dtype: jnp.dtype | None = None

    def setup(self):
        cfg = _MODEL_CONFIGS[self.encoder]
        self.pretrained = DINOv2(model_name=self.encoder, dtype=self.dtype)
        self.head = DPTHeadTemporal(
            in_channels=embed_dim(self.encoder),
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            num_frames=self.num_frames,
            dtype=self.dtype,
        )

    def _encode(self, x, t):
        """x: (B*T, H, W, 3) already /14-sized and ImageNet-normalized."""
        idx = intermediate_layer_idx(self.encoder)
        return self.pretrained.get_intermediate_layers(x, idx)

    def depth_features(self, x, t):
        """x: (B, T, H, W, 3) normalized, H/W multiples of 14.
        Returns (B, T, H, W, features//2)."""
        b, tt, h, w, _ = x.shape
        frames = x.reshape(b * tt, h, w, 3)
        feats = self._encode(frames, tt)
        out = self.head(feats, h // 14, w // 14, tt)
        return out.reshape(b, tt, *out.shape[1:])

    def fusion_features(self, x, t):
        """x: (B, T, H, W, 3) normalized, /14 sizes. Returns the 4 DPT
        fusion-path maps (finest->coarsest, `features` channels each) —
        the VFM pyramid consumed by MultiLevelEncoder_VFM
        (reference extractor.py:601-611; see module docstring on the
        reference's inconsistent call sites)."""
        b, tt, h, w, _ = x.shape
        frames = x.reshape(b * tt, h, w, 3)
        feats = self._encode(frames, tt)
        _, paths = self.head(feats, h // 14, w // 14, tt, return_paths=True)
        return tuple(p.reshape(b, tt, *p.shape[1:]) for p in paths)

    def __call__(self, x, t=None):
        t = t if t is not None else x.shape[1]
        return self.depth_features(x, t)


class DepthExtractor(nn.Module):
    """Frozen VDA features at 1/4 res, 32 channels
    (stereoanyvideo_extractor.py:238-287)."""

    encoder: str = "vits"
    dtype: jnp.dtype | None = None

    def setup(self):
        self.depthanything = VideoDepthAnything(encoder=self.encoder, dtype=self.dtype)
        self.conv = Conv(32, (4, 4), stride=4, padding=(0, 0), dtype=self.dtype)

    def __call__(self, x):
        """x: (B, T, H, W, 3) in [0, 1] ImageNet-normalized by caller or
        raw [0,255]? — the reference normalizes before this call
        (stereoanyvideo.py:210-215); we expect normalized input."""
        b, t, h, w, _ = x.shape
        nh, nw = (h // 14) * 14, (w // 14) * 14
        resized = interp_ac_false_to(x, (nh, nw))
        feats = self.depthanything.depth_features(resized, t)
        feats = jax.lax.stop_gradient(feats)
        feats = interp_ac_false_to(feats, (h, w))
        return self.conv(feats)


def interp_ac_false_to(x, hw):
    """bilinear align_corners=False resize to an arbitrary size on
    (..., H, W, C) — torch F.interpolate default semantics."""
    from ppmstereo_tpu.ops.geometry import interp_ac_false

    return interp_ac_false(x, hw)


def imagenet_normalize(images_0_255):
    """(..., 3) RGB in [0,255] -> ImageNet-normalized. Computes in f32
    regardless of input dtype (uint8 wire format would wrap otherwise)."""
    x = images_0_255.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (x - mean) / std
