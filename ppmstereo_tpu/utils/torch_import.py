"""Import torch checkpoints (reference .pth state dicts) into flax params.

The reference ships/loads torch state dicts for PPMStereo and its frozen
backbones (ppm_stereo_model.py:35-41 with legacy 'module.' prefix fixups,
convnext.py:221-223, stereoanyvideo_extractor.py:254). This module maps
them onto our channels-last flax trees so trained reference weights can
be evaluated for numerical-parity testing.

torch is imported lazily and only here — the framework itself never
depends on it; numpy .npz exports of a state dict work too.

Conversion rules:
  Conv2d weight  (O, I, kh, kw)      -> (kh, kw, I, O)
  Conv3d weight  (O, I, kt, kh, kw)  -> (kt, kh, kw, I, O)
  ConvTranspose2d (I, O, kh, kw)     -> (kh, kw, O, I) flipped per flax
  Linear weight  (O, I)              -> (I, O)
  Norm weights pass through; InstanceNorm(affine=False) has none.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch .pth / numpy .npz state dict as numpy arrays, with the
    reference's 'model'/'state_dict'/'module.' unwrapping
    (ppm_stereo_model.py:35-41)."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in raw:
            raw = raw["model"]
        if "state_dict" in raw:
            raw = raw["state_dict"]
        raw = {k: v.detach().numpy() for k, v in raw.items()}
    return {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in raw.items()}


def conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def deconv2d_w(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose (kh, kw, I, O),
    # spatially flipped: lax.conv_transpose(transpose_kernel=False) applies
    # the kernel mirrored relative to torch (verified empirically)
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_tensor(name: str, w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:
        return conv2d_w(w)
    if w.ndim == 5:
        return conv3d_w(w)
    if w.ndim == 2:
        return linear_w(w)
    return w


def flatten_params(tree: Any, prefix: tuple = ()) -> dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def unflatten_params(flat: dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def import_by_mapping(
    torch_sd: dict[str, np.ndarray],
    flax_params: dict,
    mapping: dict[str, str],
    transform: Callable[[str, np.ndarray], np.ndarray] = convert_tensor,
) -> tuple[dict, list[str]]:
    """Overwrite flax params at `mapping[torch_key] = 'a/b/c/kernel'`
    paths. Returns (new_params, missing_keys). Shapes are validated."""
    flat = flatten_params(flax_params)
    flat = {("/".join(k)): v for k, v in flat.items()}
    missing = []
    for tkey, fkey in mapping.items():
        if tkey not in torch_sd:
            missing.append(tkey)
            continue
        w = transform(tkey, torch_sd[tkey])
        if fkey not in flat:
            missing.append(f"(flax) {fkey}")
            continue
        if tuple(flat[fkey].shape) != tuple(w.shape):
            raise ValueError(
                f"shape mismatch {tkey} -> {fkey}: {w.shape} vs {flat[fkey].shape}"
            )
        flat[fkey] = w.astype(np.asarray(flat[fkey]).dtype)
    out = unflatten_params({tuple(k.split("/")): v for k, v in flat.items()})
    return out, missing
