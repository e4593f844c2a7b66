"""On-disk fixture tests for the path-convention dataset readers.

The reference datasets (Dynamic Replica, Infinigen, South Kensington,
KITTI depth — reference dynamic_stereo_datasets.py:687-1114) are not on
disk in CI, so these tests materialize miniature directory trees with the
exact file formats (jgz annotations, float16-in-uint16 PNG depth, KITTI
16-bit depth PNG, camview npz) and verify discovery, decoding, and the
depth->disparity conventions end to end.
"""

import gzip
import json
import os

import numpy as np
import pytest
from PIL import Image

from ppmstereo_tpu.data.datasets import (
    DynamicReplicaDataset,
    InfinigenStereoVideoDataset,
    KITTIDepthDataset,
    SouthKensingtonStereoVideoDataset,
)

H, W = 24, 32


def _write_rgb(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8).astype(
        np.uint8)).save(path)


def _write_f16_depth_png(path, depth):
    """Dynamic-Replica convention: float16 bits stored in a 16-bit PNG
    (reference dynamic_stereo_datasets.py:104-112)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    u16 = np.full((H, W), depth, np.float16).view(np.uint16)
    Image.fromarray(u16, mode="I;16").save(path)


class TestDynamicReplica:
    @pytest.fixture
    def root(self, tmp_path):
        root = tmp_path / "dr"
        split = "valid"
        annots = []
        for cam in ("left", "right"):
            for i in range(4):
                img_rel = f"seqA/images/{cam}_{i:03d}.png"
                depth_rel = f"seqA/depths/{cam}_{i:03d}.png"
                _write_rgb(str(root / split / img_rel), seed=i)
                _write_f16_depth_png(str(root / split / depth_rel), depth=8.0)
                annots.append({
                    "sequence_name": "seqA",
                    "camera_name": cam,
                    "image": {"path": img_rel},
                    "depth": {"path": depth_rel},
                    "viewpoint": {
                        "focal_length": [2.0, 2.0],
                        "T": ([0.0, 0.0, 0.0] if cam == "left"
                              else [0.5, 0.0, 0.0]),
                        "image_size": (H, W),
                    },
                })
        with gzip.open(root / split / f"frame_annotations_{split}.jgz",
                       "wt", encoding="utf8") as f:
            json.dump(annots, f)
        return str(root)

    def test_eval_chunking_and_depth_to_disparity(self, root):
        ds = DynamicReplicaDataset(root=root, split="valid", sample_len=2)
        # 4 frames in chunks of 2 -> 2 samples
        assert len(ds) == 2
        item = ds[0]
        assert item["img"].shape == (2, 2, H, W, 3)
        assert item["disp"].shape == (2, 1, H, W, 1)
        # disp = focal_px * baseline / depth; focal_px = 2.0 * (min(H,W)/2),
        # baseline 0.5, depth 8 -> |disp| = 2*12*0.5/8 = 1.5
        np.testing.assert_allclose(-item["disp"], 1.5, rtol=1e-3)
        assert item["valid"].min() == 1.0

    def test_only_first_n_samples_cap(self, root):
        ds = DynamicReplicaDataset(root=root, split="valid", sample_len=2,
                                   only_first_n_samples=1)
        assert len(ds) == 1


class TestInfinigen:
    @pytest.fixture
    def root(self, tmp_path):
        scene = tmp_path / "infinigen" / "scene_0"
        for i in range(3):
            _write_rgb(str(scene / f"frames/Image/camera_0/{i:04d}.png"), i)
            _write_rgb(str(scene / f"frames/Image/camera_1/{i:04d}.png"), i)
            os.makedirs(scene / "frames/Depth/camera_0", exist_ok=True)
            np.save(scene / f"frames/Depth/camera_0/{i:04d}.npy",
                    np.full((H, W), 4.0, np.float32))
        os.makedirs(scene / "frames/camview/camera_0", exist_ok=True)
        np.savez(scene / "frames/camview/camera_0/0000.npz",
                 K=np.diag([100.0, 100.0, 1.0]), baseline=np.float64(0.2))
        return str(tmp_path / "infinigen")

    def test_discovery_and_scale(self, root):
        ds = InfinigenStereoVideoDataset(root=root, sample_len=-1)
        assert len(ds) == 1
        item = ds[0]
        assert item["img"].shape == (3, 2, H, W, 3)
        # disp = K[0,0] * baseline / depth = 100 * 0.2 / 4 = 5
        np.testing.assert_allclose(-item["disp"], 5.0, rtol=1e-5)


class TestSouthKensington:
    def test_no_gt_sequences(self, tmp_path):
        scene = tmp_path / "sk" / "walk_01"
        for i in range(2):
            _write_rgb(str(scene / f"left/{i:04d}.png"), i)
            _write_rgb(str(scene / f"right/{i:04d}.png"), i + 10)
        ds = SouthKensingtonStereoVideoDataset(root=str(tmp_path / "sk"))
        assert len(ds) == 1
        item = ds[0]
        assert item["img"].shape == (2, 2, H, W, 3)
        assert "disp" not in item  # real captures carry no GT


class TestKITTIDepth:
    @pytest.fixture
    def root(self, tmp_path):
        root = tmp_path / "kitti_depth"
        drive = "2011_09_26_drive_0001_sync"
        gt = root / "train" / drive / "proj_depth/groundtruth/image_02"
        os.makedirs(gt, exist_ok=True)
        # 16-bit depth png: value/256 = meters; 0 = missing
        depth_m = np.full((H, W), 20.0, np.float32)
        depth_m[0, :] = 0.0  # a missing row
        u16 = (depth_m * 256.0).astype(np.uint16)
        for i in range(2):
            Image.fromarray(u16, mode="I;16").save(gt / f"{i:010d}.png")
            for cam in ("image_02", "image_03"):
                _write_rgb(str(root / "raw/2011_09_26" / drive / cam /
                               "data" / f"{i:010d}.png"), i)
        return str(root)

    def test_sparse_depth_and_masking(self, root):
        ds = KITTIDepthDataset(root=root, split="train")
        assert len(ds) == 1
        item = ds[0]
        assert item["img"].shape == (2, 2, H, W, 3)
        d = -item["disp"][..., 0]  # (T, 1, H, W)
        v = item["valid"]
        # disp = 721.5377 * 0.54 / 20 where valid
        np.testing.assert_allclose(d[:, :, 1:, :], 721.5377 * 0.54 / 20.0,
                                   rtol=1e-2)
        assert v[:, :, 0, :].max() == 0.0  # missing row invalid
        assert v[:, :, 1:, :].min() == 1.0
