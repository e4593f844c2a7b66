"""Sequence-consistent augmentation for stereo video clips.

Re-design of /root/reference/datasets/augmentor.py: the same augmentation
family (sequence-consistent photometric jitter with asymmetric option,
eraser occlusions, random scale/stretch, crop with optional y-jitter
simulating imperfect rectification, and the sparse-disparity re-binning
variant) implemented with numpy + cv2 and an explicit np.random.Generator
(per-worker seeding; the reference relies on global RNG state, which
breaks determinism across loader workers).

Data layout: clip is a dict of numpy arrays
  images: (T, 2, H, W, 3) uint8   (2 = left/right)
  disp:   (T, 2, H, W, 2) float32 (x, y disparity-as-flow; may be (T, 1, ...))
  valid:  (T, 2, H, W) for the sparse variant
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)
except ImportError:  # pragma: no cover
    cv2 = None


def _adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img.astype(np.float32) * factor, 0, 255)


def _adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    mean = gray.mean()
    return np.clip((img.astype(np.float32) - mean) * factor + mean, 0, 255)


def _adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    return np.clip(gray + (img.astype(np.float32) - gray) * factor, 0, 255)


def _adjust_hue(img: np.ndarray, shift: float) -> np.ndarray:
    """shift in [-0.5, 0.5] revolutions."""
    hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV)
    h = hsv[..., 0].astype(np.int32)
    hsv[..., 0] = ((h + int(round(shift * 180))) % 180).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)


def _adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    return np.clip(255.0 * gain * (img.astype(np.float32) / 255.0) ** gamma, 0, 255)


class ColorJitter:
    """torchvision-style jitter: random-order brightness/contrast/
    saturation/hue with uniform factor sampling."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=(0.6, 1.4), hue=0.5 / 3.14):
        self.brightness = (max(0, 1 - brightness), 1 + brightness)
        self.contrast = (max(0, 1 - contrast), 1 + contrast)
        self.saturation = tuple(saturation)
        self.hue = (-hue, hue)

    def sample_params(self, rng: np.random.Generator):
        return {
            "order": rng.permutation(4),
            "brightness": rng.uniform(*self.brightness),
            "contrast": rng.uniform(*self.contrast),
            "saturation": rng.uniform(*self.saturation),
            "hue": rng.uniform(*self.hue),
        }

    @staticmethod
    def apply(img: np.ndarray, p: dict) -> np.ndarray:
        out = img.astype(np.float32)
        for op in p["order"]:
            if op == 0:
                out = _adjust_brightness(out, p["brightness"])
            elif op == 1:
                out = _adjust_contrast(out, p["contrast"])
            elif op == 2:
                out = _adjust_saturation(out, p["saturation"])
            else:
                out = _adjust_hue(out, p["hue"])
        return out


class SequenceDispFlowAugmentor:
    """Dense-GT augmentor (reference augmentor.py:37-200)."""

    def __init__(
        self,
        crop_size,
        min_scale=-0.2,
        max_scale=0.5,
        do_flip=True,
        yjitter=False,
        saturation_range=(0.6, 1.4),
        gamma=(1, 1, 1, 1),
        seed: int | None = None,
    ):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 1.0
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.yjitter = yjitter
        self.do_flip = do_flip
        self.jitter = ColorJitter(saturation=saturation_range)
        self.gamma = gamma
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5
        self.rng = np.random.default_rng(seed)

    # ------------------------------------------------------------ photometric
    def _jitter_once(self, img):
        p = self.jitter.sample_params(self.rng)
        out = ColorJitter.apply(img, p)
        g_min, g_max, gain_min, gain_max = (
            self.gamma[0], self.gamma[1], self.gamma[2], self.gamma[3],
        )
        out = _adjust_gamma(
            out, self.rng.uniform(g_min, g_max), self.rng.uniform(gain_min, gain_max)
        )
        return out.astype(np.uint8)

    def color_transform(self, images: np.ndarray) -> np.ndarray:
        t = images.shape[0]
        if self.rng.random() < self.asymmetric_color_aug_prob:
            out = np.stack(
                [
                    np.stack([self._jitter_once(images[i, c]) for c in (0, 1)])
                    for i in range(t)
                ]
            )
        else:
            # one shared jitter across the whole clip and both cameras
            stack = images.reshape(t * 2, *images.shape[2:])
            p = self.jitter.sample_params(self.rng)
            gamma = self.rng.uniform(self.gamma[0], self.gamma[1])
            gain = self.rng.uniform(self.gamma[2], self.gamma[3])
            out = np.stack(
                [
                    _adjust_gamma(ColorJitter.apply(im, p), gamma, gain).astype(np.uint8)
                    for im in stack
                ]
            ).reshape(images.shape)
        return out

    # ---------------------------------------------------------------- eraser
    def eraser_transform(self, images: np.ndarray, bounds=(50, 100)) -> np.ndarray:
        t, _, ht, wd, _ = images.shape
        mean_color = images[0, 0].reshape(-1, 3).mean(axis=0)
        images = images.copy()
        for i in range(t):
            for cam in (0, 1):
                if self.rng.random() < self.eraser_aug_prob:
                    for _ in range(self.rng.integers(1, 3)):
                        x0 = self.rng.integers(0, wd)
                        y0 = self.rng.integers(0, ht)
                        dx = self.rng.integers(bounds[0], bounds[1])
                        dy = self.rng.integers(bounds[0], bounds[1])
                        images[i, cam, y0 : y0 + dy, x0 : x0 + dx] = mean_color
        return images

    # ---------------------------------------------------------------- spatial
    def _sample_scales(self, ht, wd):
        min_scale = max(
            (self.crop_size[0] + 8) / float(ht), (self.crop_size[1] + 8) / float(wd)
        )
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if self.rng.random() < self.stretch_prob:
            sx *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
        return max(sx, min_scale), max(sy, min_scale)

    def spatial_transform(self, images, disp):
        t, _, ht, wd, _ = images.shape
        sx, sy = self._sample_scales(ht, wd)

        if self.rng.random() < self.spatial_aug_prob:
            images = np.stack(
                [
                    np.stack(
                        [
                            cv2.resize(images[i, c], None, fx=sx, fy=sy,
                                       interpolation=cv2.INTER_LINEAR)
                            for c in (0, 1)
                        ]
                    )
                    for i in range(t)
                ]
            )
            if disp is not None:
                ncam = disp.shape[1]
                disp = np.stack(
                    [
                        np.stack(
                            [
                                cv2.resize(disp[i, c], None, fx=sx, fy=sy,
                                           interpolation=cv2.INTER_LINEAR)
                                * np.array([sx, sy], np.float32)
                                for c in range(ncam)
                            ]
                        )
                        for i in range(t)
                    ]
                )

        ch, cw = self.crop_size
        hh, ww = images.shape[2], images.shape[3]
        if self.yjitter:
            y0 = int(self.rng.integers(2, hh - ch - 2))
            x0 = int(self.rng.integers(2, ww - cw - 2))
            imgs_out, disp_out = [], []
            for i in range(t):
                y1 = y0 + int(self.rng.integers(-2, 3))
                left = images[i, 0, y0 : y0 + ch, x0 : x0 + cw]
                right = images[i, 1, y1 : y1 + ch, x0 : x0 + cw]
                imgs_out.append(np.stack([left, right]))
                if disp is not None:
                    d = [disp[i, 0, y0 : y0 + ch, x0 : x0 + cw]]
                    if disp.shape[1] > 1:
                        d.append(disp[i, 1, y1 : y1 + ch, x0 : x0 + cw])
                    disp_out.append(np.stack(d))
            images = np.stack(imgs_out)
            disp = np.stack(disp_out) if disp is not None else None
        else:
            y0 = int(self.rng.integers(0, hh - ch))
            x0 = int(self.rng.integers(0, ww - cw))
            images = images[:, :, y0 : y0 + ch, x0 : x0 + cw]
            if disp is not None:
                disp = disp[:, :, y0 : y0 + ch, x0 : x0 + cw]
        return images, disp

    def __call__(self, images, disp):
        images = self.color_transform(images)
        images = self.eraser_transform(images)
        images, disp = self.spatial_transform(images, disp)
        return np.ascontiguousarray(images), (
            np.ascontiguousarray(disp) if disp is not None else None
        )


class SequenceDispSparseFlowAugmentor(SequenceDispFlowAugmentor):
    """Sparse-GT variant: nearest re-binning of valid disparity samples
    instead of bilinear resize (reference augmentor.py:204-371)."""

    def color_transform(self, images):
        # sparse variant is always symmetric (reference :244-257)
        t = images.shape[0]
        stack = images.reshape(t * 2, *images.shape[2:])
        p = self.jitter.sample_params(self.rng)
        gamma = self.rng.uniform(self.gamma[0], self.gamma[1])
        gain = self.rng.uniform(self.gamma[2], self.gamma[3])
        return np.stack(
            [
                _adjust_gamma(ColorJitter.apply(im, p), gamma, gain).astype(np.uint8)
                for im in stack
            ]
        ).reshape(images.shape)

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        ht, wd = flow.shape[:2]
        xx, yy = np.meshgrid(np.arange(wd), np.arange(ht))
        coords = np.stack([xx, yy], axis=-1).reshape(-1, 2).astype(np.float32)
        flow_flat = flow.reshape(-1, 2).astype(np.float32)
        valid_flat = valid.reshape(-1) >= 1

        coords0 = coords[valid_flat]
        flow0 = flow_flat[valid_flat]

        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]

        xi = np.round(coords1[:, 0]).astype(np.int32)
        yi = np.round(coords1[:, 1]).astype(np.int32)
        keep = (xi > 0) & (xi < wd1) & (yi > 0) & (yi < ht1)

        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yi[keep], xi[keep]] = flow1[keep]
        valid_img[yi[keep], xi[keep]] = 1
        return flow_img, valid_img

    def spatial_transform(self, images, disp, valid):
        t, _, ht, wd, _ = images.shape
        sx, sy = self._sample_scales(ht, wd)

        if self.rng.random() < self.spatial_aug_prob:
            images = np.stack(
                [
                    np.stack(
                        [
                            cv2.resize(images[i, c], None, fx=sx, fy=sy,
                                       interpolation=cv2.INTER_LINEAR)
                            for c in (0, 1)
                        ]
                    )
                    for i in range(t)
                ]
            )
            if disp is not None:
                new_d, new_v = [], []
                for i in range(t):
                    ds, vs = [], []
                    for c in range(disp.shape[1]):
                        d, v = self.resize_sparse_flow_map(
                            disp[i, c], valid[i, c], fx=sx, fy=sy
                        )
                        ds.append(d)
                        vs.append(v)
                    new_d.append(np.stack(ds))
                    new_v.append(np.stack(vs))
                disp, valid = np.stack(new_d), np.stack(new_v)

        ch, cw = self.crop_size
        hh, ww = images.shape[2], images.shape[3]
        y0 = int(self.rng.integers(0, hh - ch))
        x0 = int(self.rng.integers(0, ww - cw))
        images = images[:, :, y0 : y0 + ch, x0 : x0 + cw]
        if disp is not None:
            disp = disp[:, :, y0 : y0 + ch, x0 : x0 + cw]
            valid = valid[:, :, y0 : y0 + ch, x0 : x0 + cw]
        return images, disp, valid

    def __call__(self, images, disp, valid):
        images = self.color_transform(images)
        images = self.eraser_transform(images)
        images, disp, valid = self.spatial_transform(images, disp, valid)
        return (
            np.ascontiguousarray(images),
            np.ascontiguousarray(disp) if disp is not None else None,
            np.ascontiguousarray(valid) if valid is not None else None,
        )
