"""CPU stubs for the reference's CUDA-only / missing dependencies.

Lets the PyTorch reference model run on CPU for end-to-end parity tests:
  * flash_attn.flash_attn_func -> torch scaled_dot_product_attention
  * unfoldNd.UnfoldNd          -> 3-D im2col via shifted slices
  * timm.models.layers         -> trunc_normal_, DropPath

Test-only file: torch usage is confined to tests.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn.functional as F


def install():
    # ---- flash_attn ------------------------------------------------------
    flash = types.ModuleType("flash_attn")

    def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None, causal=False):
        # q/k/v: (B, S, H, D) -> torch sdpa wants (B, H, S, D)
        qt, kt, vt = (x.transpose(1, 2) for x in (q, k, v))
        out = F.scaled_dot_product_attention(
            qt, kt, vt, scale=softmax_scale, is_causal=causal
        )
        return out.transpose(1, 2)

    flash.flash_attn_func = flash_attn_func
    flash.flash_attn_qkvpacked_func = None
    sys.modules.setdefault("flash_attn", flash)

    # ---- unfoldNd --------------------------------------------------------
    unfold_mod = types.ModuleType("unfoldNd")

    class UnfoldNd:
        def __init__(self, kernel_size, padding=0, dilation=1, stride=1):
            self.k = kernel_size
            self.p = padding if isinstance(padding, (tuple, list)) else (padding,) * 3

        def __call__(self, x):
            # x: (N, C, T, H, W) -> (N, C*prod(k), T*H*W) im2col
            kt, kh, kw = self.k
            pt, ph, pw = self.p
            n, c, t, h, w = x.shape
            xp = F.pad(x, (pw, pw, ph, ph, pt, pt))
            taps = []
            for dt in range(kt):
                for dy in range(kh):
                    for dx in range(kw):
                        taps.append(xp[:, :, dt : dt + t, dy : dy + h, dx : dx + w])
            out = torch.stack(taps, dim=2)  # (N, C, K, T, H, W)
            return out.reshape(n, c * kt * kh * kw, t * h * w)

    unfold_mod.UnfoldNd = UnfoldNd
    sys.modules.setdefault("unfoldNd", unfold_mod)

    # ---- timm ------------------------------------------------------------
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    # ---- pytorch3d (eval_utils imports opencv_from_cameras_projection,
    # unused by the metric functions themselves) -----------------------
    p3d = types.ModuleType("pytorch3d")
    p3d_utils = types.ModuleType("pytorch3d.utils")
    p3d_utils.opencv_from_cameras_projection = None
    p3d.utils = p3d_utils
    sys.modules.setdefault("pytorch3d", p3d)
    sys.modules.setdefault("pytorch3d.utils", p3d_utils)

    # ---- easydict (used by dpt_temporal.py for motion-module kwargs) ---
    easydict = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            d = dict(d or {}, **kw)
            for k, v in d.items():
                self[k] = v
                setattr(self, k, v)

    easydict.EasyDict = EasyDict
    sys.modules.setdefault("easydict", easydict)

    # ---- torchvision (video_depth.py imports transforms.Compose) ------
    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    tv_tr.Compose = Compose
    tv.transforms = tv_tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tr)
