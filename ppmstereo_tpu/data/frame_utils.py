"""File-format readers for stereo/flow datasets.

Same formats as /root/reference/datasets/frame_utils.py (Middlebury .flo,
PFM, Sintel packed-PNG disparity, Middlebury GT, 16-bit float PNG depth,
KITTI / VKITTI2 depth PNGs) — standard public formats, implemented
numpy-first and channels-last.
"""

from __future__ import annotations

import os.path as osp
import re

import numpy as np

FLO_MAGIC = 202021.25


def read_flow(path: str) -> np.ndarray:
    """Middlebury .flo -> (H, W, 2) float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != np.float32(FLO_MAGIC):
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def read_pfm(path: str) -> np.ndarray:
    """PFM -> (H, W) or (H, W, 3) float, bottom-up flipped to top-down."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM header in {path}")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if channels == 3 else (height, width)
    return np.flipud(data.reshape(shape))


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0):
    data = np.asarray(data, np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        endian = data.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(data).tofile(f)


def read_image(path: str) -> np.ndarray:
    """RGB uint8 (H, W, 3)."""
    from PIL import Image

    img = np.asarray(Image.open(path))
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    return img[..., :3].astype(np.uint8)


def read_disp_sintel(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Sintel packed-PNG disparity + occlusion validity
    (reference frame_utils.py:80-90)."""
    from PIL import Image

    rgb = np.asarray(Image.open(path)).astype(np.float64)
    disp = rgb[..., 0] * 4 + rgb[..., 1] / 2**6 + rgb[..., 2] / 2**14
    mask = np.asarray(Image.open(path.replace("disparities", "occlusions")))
    valid = (mask == 0) & (disp > 0)
    return disp, valid


def read_disp_middlebury(path: str) -> tuple[np.ndarray, np.ndarray]:
    assert osp.basename(path) == "disp0GT.pfm"
    disp = read_pfm(path).astype(np.float32)
    from PIL import Image

    nocc = np.asarray(Image.open(path.replace("disp0GT.pfm", "mask0nocc.png"))) == 255
    return disp, nocc


def read_16bit_float_depth(path: str) -> np.ndarray:
    """16-bit PNG reinterpreted as float16 depth (Dynamic Replica
    convention, reference dynamic_stereo_datasets.py:104-112)."""
    from PIL import Image

    with Image.open(path) as depth_pil:
        depth = (
            np.frombuffer(np.array(depth_pil, dtype=np.uint16), dtype=np.float16)
            .astype(np.float32)
            .reshape((depth_pil.size[1], depth_pil.size[0]))
        )
    return depth


def read_kitti_depth(path: str) -> np.ndarray:
    from PIL import Image

    raw = np.array(Image.open(path), dtype=int)
    assert raw.max() > 255, "expected 16-bit KITTI depth"
    depth = raw.astype(np.float32) / 256.0
    depth[raw == 0] = -1.0
    return depth


def read_vkitti2_depth(path: str) -> np.ndarray:
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    depth = raw.astype(np.float32) / 100.0
    depth[raw == 0] = -1.0
    return depth


def read_gen(path: str):
    """Dispatch by extension (reference frame_utils.py:104-118).

    PFM/FLO go through the native C++ reader when built (data/native.py);
    numpy parsing otherwise.
    """
    ext = osp.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return read_image(path)
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        from ppmstereo_tpu.data import native

        if native.available():
            return native.read_flo(path)
        return read_flow(path).astype(np.float32)
    if ext == ".pfm":
        from ppmstereo_tpu.data import native

        if native.available():
            data = native.read_pfm(path)
        else:
            data = read_pfm(path).astype(np.float32)
        return data if data.ndim == 2 else data[..., :-1]
    raise ValueError(f"unsupported extension: {path}")


def read_depth_any(path: str) -> np.ndarray:
    """Depth dispatch matching the reference's _load_depth
    (dynamic_stereo_datasets.py:67-79)."""
    if path.endswith("npy"):
        return np.load(path)
    if path.endswith("png"):
        if "kitti_depth" in path:
            return read_kitti_depth(path)
        if "vkitti2" in path:
            return read_vkitti2_depth(path)
        return read_16bit_float_depth(path)
    raise ValueError(f"unsupported depth format: {path}")
