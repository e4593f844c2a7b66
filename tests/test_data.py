"""Data layer tests: synthetic dataset, augmentor, loader, formats."""

import numpy as np
import pytest

from ppmstereo_tpu.data.augmentor import (
    SequenceDispFlowAugmentor,
    SequenceDispSparseFlowAugmentor,
)
from ppmstereo_tpu.data.datasets import SyntheticStereoDataset, fetch_dataloader
from ppmstereo_tpu.data.loader import PrefetchLoader
from ppmstereo_tpu.data import frame_utils


class TestSynthetic:
    def test_sample_geometry(self):
        ds = SyntheticStereoDataset(num_seqs=2, sample_len=3, height=96, width=160)
        s = ds[0]
        assert s["img"].shape == (3, 2, 96, 160, 3)
        assert s["disp"].shape == (3, 1, 96, 160, 1)
        assert s["valid"].shape == (3, 1, 96, 160)
        # stored as negative-x flow
        assert (s["disp"] <= 0).all()

    def test_right_view_is_warped_left(self):
        """Photometric consistency: left(x) == right(x - d) on layer
        interiors (exact by construction)."""
        ds = SyntheticStereoDataset(num_seqs=1, sample_len=1, height=64, width=128)
        raw = ds._load_sample(0)
        left = raw["img"][0, 0].astype(np.int32)
        right = raw["img"][0, 1].astype(np.int32)
        disp = -raw["disp"][0, 0, :, :, 0]
        h, w = left.shape[:2]
        matches = 0
        total = 0
        for y in range(0, h, 7):
            for x in range(0, w, 7):
                d = int(round(disp[y, x]))
                if 0 <= x - d < w:
                    total += 1
                    if np.array_equal(left[y, x], right[y, x - d]):
                        matches += 1
        assert matches / total > 0.8  # boundaries may disagree


class TestAugmentor:
    def _clip(self, t=3, h=160, w=240):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (t, 2, h, w, 3)).astype(np.uint8)
        disp = rng.uniform(-40, 0, (t, 1, h, w, 2)).astype(np.float32)
        return imgs, disp

    def test_dense_output_shapes(self):
        imgs, disp = self._clip()
        aug = SequenceDispFlowAugmentor(crop_size=(96, 128), yjitter=True, seed=0)
        out_i, out_d = aug(imgs, disp)
        assert out_i.shape == (3, 2, 96, 128, 3)
        assert out_d.shape == (3, 1, 96, 128, 2)

    def test_sparse_output_shapes(self):
        rng = np.random.default_rng(0)
        imgs, disp = self._clip()
        valid = (rng.random((3, 1, 160, 240)) > 0.5).astype(np.float32)
        aug = SequenceDispSparseFlowAugmentor(crop_size=(96, 128), seed=0)
        out_i, out_d, out_v = aug(imgs, disp, valid)
        assert out_i.shape == (3, 2, 96, 128, 3)
        assert out_d.shape == (3, 1, 96, 128, 2)
        assert out_v.shape == (3, 1, 96, 128)

    def test_disparity_rescaled_with_scale(self):
        imgs, disp = self._clip()
        aug = SequenceDispFlowAugmentor(crop_size=(96, 128), seed=3)
        aug.stretch_prob = 0.0
        aug.eraser_aug_prob = 0.0
        aug.asymmetric_color_aug_prob = 0.0
        out_i, out_d = aug(imgs, disp)
        # magnitudes should stay in a plausible rescaled range
        assert np.abs(out_d[..., 0]).max() < 40 * 2**0.5 + 1


class TestLoader:
    def test_batches(self):
        ds = SyntheticStereoDataset(num_seqs=6, sample_len=2, height=64, width=96)
        loader = PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["left"].shape == (2, 2, 64, 96, 3)
        assert b["right"].shape == (2, 2, 64, 96, 3)
        assert b["disparity"].shape == (2, 2, 64, 96, 1)
        assert b["valid"].shape == (2, 2, 64, 96)

    def test_fetch_dataloader_synthetic_fallback(self, tmp_path):
        loader = fetch_dataloader(
            crop_size=(64, 96),
            sample_len=2,
            batch_size=2,
            num_workers=2,
            sceneflow_root=str(tmp_path / "nonexistent"),
            dynamic_replica_root=str(tmp_path / "nonexistent2"),
        )
        batch = next(iter(loader))
        assert batch["left"].shape == (2, 2, 64, 96, 3)
        assert batch["disparity"].shape == (2, 2, 64, 96, 1)


class TestFrameUtils:
    def test_pfm_roundtrip(self, tmp_path, rng):
        data = rng.standard_normal((17, 23)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        frame_utils.write_pfm(p, data)
        back = frame_utils.read_pfm(p)
        np.testing.assert_allclose(back, data)

    def test_flo_roundtrip(self, tmp_path, rng):
        flow = rng.standard_normal((9, 11, 2)).astype(np.float32)
        p = str(tmp_path / "x.flo")
        with open(p, "wb") as f:
            np.array([202021.25], np.float32).tofile(f)
            np.array([11], np.int32).tofile(f)
            np.array([9], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        back = frame_utils.read_flow(p)
        np.testing.assert_allclose(back, flow)

    def test_read_gen_dispatch(self, tmp_path, rng):
        from PIL import Image

        img = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        back = frame_utils.read_gen(p)
        np.testing.assert_array_equal(back, img)


class TestNative:
    def test_native_pfm_matches_python(self, tmp_path, rng):
        from ppmstereo_tpu.data import native

        data = rng.standard_normal((13, 17)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        frame_utils.write_pfm(p, data)
        got = native.read_pfm(p)
        np.testing.assert_allclose(got, data)

    def test_native_flo_matches_python(self, tmp_path, rng):
        from ppmstereo_tpu.data import native

        flow = rng.standard_normal((9, 11, 2)).astype(np.float32)
        p = str(tmp_path / "x.flo")
        with open(p, "wb") as f:
            np.array([202021.25], np.float32).tofile(f)
            np.array([11], np.int32).tofile(f)
            np.array([9], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        np.testing.assert_allclose(native.read_flo(p), flow)

    def test_native_available_and_photometric(self, rng):
        from ppmstereo_tpu.data import native

        img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
        out = native.photometric_fused(
            img.copy(), 1.2, 0.9, 1.1, 1.0, 1.0, np.array([0, 1, 2])
        )
        assert out.shape == img.shape and out.dtype == np.uint8
        # brightness x1.2 then contrast/saturation: output differs from input
        assert not np.array_equal(out, img)
