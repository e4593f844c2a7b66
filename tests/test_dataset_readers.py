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
                    # true DR/CO3D layout: size lives on image, the
                    # intrinsics format on viewpoint
                    "image": {"path": img_rel, "size": (H, W)},
                    "depth": {"path": depth_rel},
                    "viewpoint": {
                        "focal_length": [2.0, 2.0],
                        "principal_point": [0.0, 0.0],
                        "intrinsics_format": "ndc_norm_image_bounds",
                        "T": ([0.0, 0.0, 0.0] if cam == "left"
                              else [0.5, 0.0, 0.0]),
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
        # disp = focal_px * baseline / depth; ndc_norm_image_bounds ->
        # focal_px = 2.0 * (W/2) = 32, baseline 0.5, depth 8 -> |disp| = 2.0
        np.testing.assert_allclose(-item["disp"], 2.0, rtol=1e-3)
        assert item["valid"].min() == 1.0

    @pytest.mark.parametrize("fmt", ["ndc_norm_image_bounds", "ndc_isotropic"])
    def test_d2d_scale_matches_pytorch3d_chain(self, fmt):
        """_d2d_scale vs an independent numpy replication of the
        reference's full chain (dynamic_stereo_datasets.py:151-197 NDC->
        pytorch3d camera -> eval_utils.py:101-113 via pytorch3d's
        opencv_from_cameras_projection semantics), both NDC conventions."""
        h, w = 720, 1280
        focal_ndc = np.array([1.8, 1.7])
        pp_ndc = np.array([0.02, -0.01])
        t_l = np.array([0.11, 0.2, 1.0])
        t_r = np.array([0.64, 0.2, 1.0])

        def reference_chain(vp_l_T, vp_r_T):
            # _get_pytorch3d_camera (scale=1)
            half_wh = np.array([w, h]) / 2.0
            rescale = half_wh if fmt == "ndc_norm_image_bounds" else half_wh.min()
            pp_px = half_wh - pp_ndc * rescale
            focal_px = focal_ndc * rescale
            half_min = half_wh.min()
            focal_ndc_pt3d = focal_px / half_min
            # opencv_from_cameras_projection: focal back to px via
            # min(image_size)/2; tvec = T with x, y negated
            Ks, Ts = [], []
            for T in (vp_l_T, vp_r_T):
                K00 = focal_ndc_pt3d[0] * half_min
                tvec = T * np.array([-1.0, -1.0, 1.0])
                Ks.append(K00)
                Ts.append(tvec)
            fix_baseline = Ts[0][0] - Ts[1][0]
            return Ks[0] * fix_baseline

        filenames = {
            "viewpoint": {
                "left": [{
                    "focal_length": list(focal_ndc),
                    "principal_point": list(pp_ndc),
                    "intrinsics_format": fmt,
                    "T": list(t_l),
                }],
                "right": [{
                    "focal_length": list(focal_ndc),
                    "principal_point": list(pp_ndc),
                    "intrinsics_format": fmt,
                    "T": list(t_r),
                }],
            },
            "image_size": {"left": [(h, w)], "right": [(h, w)]},
        }
        got = DynamicReplicaDataset._d2d_scale(filenames)
        want = reference_chain(t_l, t_r)
        np.testing.assert_allclose(got, want, rtol=1e-6)

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


class TestSouthKensingtonSub:
    def test_named_subsequence(self, tmp_path):
        from ppmstereo_tpu.data.datasets import SouthKensingtonStereoVideoSubDataset

        scene = tmp_path / "sk" / "indoor" / "video010"
        for i in range(4):
            _write_rgb(str(scene / f"images/left/{i:04d}.png"), i)
            _write_rgb(str(scene / f"images/right/{i:04d}.png"), i)
        ds = SouthKensingtonStereoVideoSubDataset(
            root=str(tmp_path / "sk"), dtype="indoor", subname="video010",
            sample_len=2,
        )
        assert len(ds) == 2
        item = ds[0]
        assert item["img"].shape == (2, 2, H, W, 3)
        assert "disp" not in item  # no GT


class TestSintelTrain:
    def test_forward_and_reversed_clips(self, tmp_path):
        from ppmstereo_tpu.data.datasets import SequenceSintelStereoTrain

        root = tmp_path / "sintel"
        seq = root / "training"
        for i in range(4):
            _write_rgb(str(seq / f"final_left/alley_1/frame_{i:04d}.png"), i)
            _write_rgb(str(seq / f"final_right/alley_1/frame_{i:04d}.png"), i)
            # Sintel disparity PNG encoding: d = R*4 + G/2^6 + B/2^14
            os.makedirs(seq / "disparities/alley_1", exist_ok=True)
            img = np.zeros((H, W, 3), np.uint8)
            img[..., 0] = 2  # disparity = 8 px
            Image.fromarray(img).save(
                seq / f"disparities/alley_1/frame_{i:04d}.png"
            )
            os.makedirs(seq / "occlusions/alley_1", exist_ok=True)
            Image.fromarray(np.zeros((H, W), np.uint8)).save(
                seq / f"occlusions/alley_1/frame_{i:04d}.png"
            )
        ds = SequenceSintelStereoTrain(dstype="final", root=str(root), sample_len=2)
        # (seq_len - sample_len) starts x 2 (forward + reversed) = 4
        assert len(ds) == 4
        item = ds[0]
        assert item["img"].shape == (2, 2, H, W, 3)
        np.testing.assert_allclose(-item["disp"], 8.0, rtol=1e-5)


class TestVKITTI2:
    def test_depth_to_disparity(self, tmp_path):
        from ppmstereo_tpu.data.datasets import VKITTI2StereoVideoDataset

        base = tmp_path / "vkitti2" / "Scene01" / "clone" / "frames"
        for i in range(2):
            _write_rgb(str(base / f"rgb/Camera_0/rgb_{i:05d}.jpg"), i)
            _write_rgb(str(base / f"rgb/Camera_1/rgb_{i:05d}.jpg"), i)
            os.makedirs(base / "depth/Camera_0", exist_ok=True)
            # VKITTI2 stores depth as uint16 centimeters
            depth_cm = np.full((H, W), 1000, np.uint16)  # 10 m
            Image.fromarray(depth_cm, mode="I;16").save(
                base / f"depth/Camera_0/depth_{i:05d}.png"
            )
        ds = VKITTI2StereoVideoDataset(root=str(tmp_path / "vkitti2"))
        assert len(ds) == 1
        item = ds[0]
        want = 725.0087 * 0.532725 / 10.0
        np.testing.assert_allclose(-item["disp"], want, rtol=1e-4)
