"""Video-stereo datasets: path discovery, clip sampling, GT conventions.

Re-design of /root/reference/datasets/dynamic_stereo_datasets.py (1,487
LoC) with the same directory conventions and GT semantics:

  * disparity is stored as negative-x flow: np.stack([-disp, 0])
    (reference :558) — predictions are compared as |x|;
  * valid = |disp| < 512 and nonzero (reference :555,639-642);
  * depth-GT datasets convert with disp = (focal_px * baseline) / depth
    (reference eval_utils.py:101-113);
  * SceneFlow adds forward AND time-reversed clips (reference :1259-1274);
  * Dynamic Replica reads gzip-json frame annotations; train sampling
    takes a reference frame every 3 frames with a random temporal stride
    in [1, 5] (reference :752-754), eval takes contiguous sample_len
    chunks with an only_first_n_samples cap (reference :768-781);
  * a corrupt sample resamples a random index (reference :594-601).

Samples are channels-last numpy dicts:
  img   (T, 2, H, W, 3) float32   [0, 255]
  disp  (T, 1, H, W, 1) float32   (negative-x disparity; left cam)
  valid (T, 1, H, W)    float32

plus a SyntheticStereoDataset that renders random plane-sweep scenes with
exact analytic disparity — CI/benchmarks run end-to-end without any
dataset on disk.
"""

from __future__ import annotations

import copy
import gzip
import json
import logging
import os.path as osp
from collections import defaultdict
from glob import glob

import numpy as np

from ppmstereo_tpu.data import frame_utils
from ppmstereo_tpu.data.augmentor import (
    SequenceDispFlowAugmentor,
    SequenceDispSparseFlowAugmentor,
)


class StereoSequenceDataset:
    """Base: owns the sample list, readers, augmentation, GT conventions."""

    def __init__(self, aug_params=None, sparse=False, reader=None):
        self.augmentor = None
        self.sparse = sparse
        aug_params = dict(aug_params) if aug_params is not None else None
        self.img_pad = aug_params.pop("img_pad", None) if aug_params else None
        if aug_params is not None and "crop_size" in aug_params:
            cls = SequenceDispSparseFlowAugmentor if sparse else SequenceDispFlowAugmentor
            self.augmentor = cls(**aug_params)
        self.disparity_reader = reader or frame_utils.read_gen
        self.depth_reader = frame_utils.read_depth_any
        self.is_test = False
        self.split = "train"
        self.sample_list: list = []
        self.extra_info: list = []
        self.depth_eps = 1e-5
        self.rng = np.random.default_rng(0)

    # ------------------------------------------------------------- loading
    def _load_sample(self, sample) -> dict:
        t = len(sample["image"]["left"])
        imgs = np.stack(
            [
                np.stack(
                    [
                        frame_utils.read_image(sample["image"][cam][i])
                        for cam in ("left", "right")
                    ]
                )
                for i in range(t)
            ]
        )  # (T, 2, H, W, 3) uint8

        disp = valid = None
        if "disparity" in sample and "left" in sample["disparity"]:
            ds, vs = [], []
            for i in range(t):
                d = self.disparity_reader(sample["disparity"]["left"][i])
                if isinstance(d, tuple):
                    d, v = d
                else:
                    v = d < 512
                d = np.asarray(d, np.float32)
                ds.append(np.stack([-d, np.zeros_like(d)], axis=-1))
                vs.append(np.asarray(v, np.float32))
            disp = np.stack(ds)[:, None]  # (T, 1, H, W, 2)
            valid = np.stack(vs)[:, None]  # (T, 1, H, W)
        elif "depth" in sample and "left" in sample["depth"]:
            scale = sample["depth2disp_scale"]
            ds, vs = [], []
            for i in range(t):
                depth = self.depth_reader(sample["depth"]["left"][i])
                bad = depth < self.depth_eps
                depth = np.where(bad, self.depth_eps, depth)
                d = scale / depth
                d = np.where(bad, 0.0, d)
                v = (d < 512) & ~bad
                ds.append(np.stack([-d, np.zeros_like(d)], axis=-1).astype(np.float32))
                vs.append(v.astype(np.float32))
            disp = np.stack(ds)[:, None]
            valid = np.stack(vs)[:, None]
        return {"img": imgs, "disp": disp, "valid": valid}

    def __getitem__(self, index) -> dict:
        index = index % len(self.sample_list)
        try:
            out = self._load_sample(self.sample_list[index])
        except Exception:
            logging.warning(f"Exception loading sample {index}; resampling")
            index = int(self.rng.integers(len(self.sample_list)))
            out = self._load_sample(self.sample_list[index])

        imgs, disp, valid = out["img"], out["disp"], out["valid"]

        if self.augmentor is not None:
            if self.sparse:
                imgs, disp, v2 = self.augmentor(imgs, disp, valid)
                valid = v2.astype(np.float32) if v2 is not None else None
            else:
                imgs, disp = self.augmentor(imgs, disp)

        imgs = imgs.astype(np.float32)
        res = {"img": imgs}
        if disp is not None:
            disp = np.asarray(disp, np.float32)
            if not self.sparse:
                valid = (
                    (np.abs(disp[..., 0]) < 512) & (np.abs(disp[..., 0]) != 0)
                ).astype(np.float32)
            res["disp"] = disp[..., :1]  # x channel only (reference :658)
            res["valid"] = np.asarray(valid, np.float32)
        return res

    def __mul__(self, v: int):
        clone = copy.copy(self)
        clone.sample_list = v * self.sample_list
        clone.extra_info = v * self.extra_info
        return clone

    def __add__(self, other: "StereoSequenceDataset"):
        combined = ConcatStereoDataset([self, other])
        return combined

    def __len__(self):
        return len(self.sample_list)


class ConcatStereoDataset:
    def __init__(self, datasets):
        self.datasets = []
        for d in datasets:
            if isinstance(d, ConcatStereoDataset):
                self.datasets.extend(d.datasets)
            else:
                self.datasets.append(d)
        self._lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self._lengths)

    def __getitem__(self, index):
        for d, n in zip(self.datasets, self._lengths):
            if index < n:
                return d[index]
            index -= n
        raise IndexError

    def __add__(self, other):
        return ConcatStereoDataset([self, other])

    def __mul__(self, v: int):
        return ConcatStereoDataset([d * v for d in self.datasets])


class SequenceSceneFlowDataset(StereoSequenceDataset):
    """FlyingThings3D + Monkaa + Driving
    (reference dynamic_stereo_datasets.py:1117-1274)."""

    def __init__(
        self,
        aug_params=None,
        root="datasets/SceneFlow",
        dstype="frames_finalpass",
        sample_len=1,
        things_test=False,
        add_things=True,
        add_monkaa=True,
        add_driving=True,
    ):
        super().__init__(aug_params)
        self.root = root
        self.dstype = dstype
        self.sample_len = sample_len
        if things_test:
            self._add_things("TEST")
        else:
            if add_things:
                self._add_things("TRAIN")
            if add_monkaa:
                self._add_monkaa()
            if add_driving:
                self._add_driving()

    def _scan(self, pattern):
        image_paths, disparity_paths = {}, {}
        for cam in ("left", "right"):
            image_paths[cam] = sorted(glob(pattern.format(cam=cam)))
            disparity_paths[cam] = [
                p.replace(self.dstype, "disparity") for p in image_paths[cam]
            ]
        return image_paths, disparity_paths

    def _collect(self, image_paths, disparity_paths, seq_idx):
        images, disparities = defaultdict(list), defaultdict(list)
        for cam in ("left", "right"):
            images[cam] = sorted(glob(osp.join(image_paths[cam][seq_idx], "*.png")))
            disparities[cam] = sorted(
                glob(osp.join(disparity_paths[cam][seq_idx], "*.pfm"))
            )
        self._append_sample(images, disparities)

    def _add_things(self, split="TRAIN"):
        root = osp.join(self.root, "FlyingThings3D")
        image_paths, disparity_paths = self._scan(
            osp.join(root, self.dstype, split, "*/*/{cam}/")
        )
        # the reference carves a fixed 40-sequence validation subset with a
        # seeded permutation (reference :1158-1164)
        state = np.random.RandomState(1000)
        val_idxs = set(state.permutation(len(image_paths["left"]))[:40])
        for seq_idx in range(len(image_paths["left"])):
            if (split == "TEST" and seq_idx in val_idxs) or (
                split == "TRAIN" and seq_idx not in val_idxs
            ):
                self._collect(image_paths, disparity_paths, seq_idx)
        logging.info(f"SceneFlow/Things[{split}]: {len(self.sample_list)} samples")

    def _add_monkaa(self):
        root = osp.join(self.root, "Monkaa")
        image_paths, disparity_paths = self._scan(
            osp.join(root, self.dstype, "*/{cam}/")
        )
        for seq_idx in range(len(image_paths["left"])):
            self._collect(image_paths, disparity_paths, seq_idx)

    def _add_driving(self):
        root = osp.join(self.root, "Driving")
        image_paths, disparity_paths = self._scan(
            osp.join(root, self.dstype, "*/*/*/{cam}/")
        )
        for seq_idx in range(len(image_paths["left"])):
            self._collect(image_paths, disparity_paths, seq_idx)

    def _append_sample(self, images, disparities):
        """Forward and time-reversed clips (reference :1259-1274)."""
        seq_len = len(images["left"])
        for ref_idx in range(0, seq_len - self.sample_len):
            fwd = defaultdict(lambda: defaultdict(list))
            bwd = defaultdict(lambda: defaultdict(list))
            for cam in ("left", "right"):
                for idx in range(ref_idx, ref_idx + self.sample_len):
                    fwd["image"][cam].append(images[cam][idx])
                    fwd["disparity"][cam].append(disparities[cam][idx])
                    bwd["image"][cam].append(images[cam][seq_len - idx - 1])
                    bwd["disparity"][cam].append(disparities[cam][seq_len - idx - 1])
            self.sample_list.append(fwd)
            self.sample_list.append(bwd)


class SequenceSintelStereo(StereoSequenceDataset):
    """Sintel stereo training sequences (reference :1278-1404)."""

    def __init__(self, dstype="clean", aug_params=None, root="datasets/sintel_stereo"):
        super().__init__(
            aug_params, sparse=True, reader=frame_utils.read_disp_sintel
        )
        self.dstype = dstype
        self.split = "test"
        image_root = osp.join(root, "training")
        for seq_path in sorted(glob(osp.join(image_root, f"{dstype}_left/*"))):
            seq = osp.basename(seq_path)
            sample = defaultdict(lambda: defaultdict(list))
            lefts = sorted(glob(osp.join(seq_path, "*.png")))
            for img_l in lefts:
                frame = osp.basename(img_l)
                sample["image"]["left"].append(img_l)
                sample["image"]["right"].append(
                    osp.join(image_root, f"{dstype}_right", seq, frame)
                )
                sample["disparity"]["left"].append(
                    osp.join(image_root, "disparities", seq, frame)
                )
            if sample["image"]["left"]:
                self.sample_list.append(sample)
                self.extra_info.append(seq)


class SequenceSintelStereoTrain(StereoSequenceDataset):
    """Sintel as a TRAINING source (reference SequenceSintelStereo_train,
    :1337-1404): dense clips of `sample_len` frames sliding by one, each
    also added time-reversed."""

    def __init__(self, aug_params=None, dstype="final",
                 root="datasets/sintel_stereo", sample_len=1):
        super().__init__(aug_params, reader=frame_utils.read_disp_sintel)
        self.dstype = dstype
        self.sample_len = sample_len
        image_root = osp.join(root, "training")
        for seq_path in sorted(glob(osp.join(image_root, f"{dstype}_left/*"))):
            seq = osp.basename(seq_path)
            lefts = sorted(glob(osp.join(seq_path, "*.png")))
            images = {
                "left": lefts,
                "right": [
                    osp.join(image_root, f"{dstype}_right", seq, osp.basename(p))
                    for p in lefts
                ],
            }
            disps = [
                osp.join(image_root, "disparities", seq, osp.basename(p))
                for p in lefts
            ]
            seq_len = len(lefts)
            for ref in range(0, seq_len - self.sample_len):
                fwd = defaultdict(lambda: defaultdict(list))
                rev = defaultdict(lambda: defaultdict(list))
                for idx in range(ref, ref + self.sample_len):
                    for cam in ("left", "right"):
                        fwd["image"][cam].append(images[cam][idx])
                        rev["image"][cam].append(images[cam][seq_len - idx - 1])
                    fwd["disparity"]["left"].append(disps[idx])
                    rev["disparity"]["left"].append(disps[seq_len - idx - 1])
                self.sample_list.append(fwd)
                self.sample_list.append(rev)


class VKITTI2StereoVideoDataset(StereoSequenceDataset):
    """Virtual KITTI 2 stereo video. The reference carries the VKITTI2
    depth decoder (dynamic_stereo_datasets.py:84-112: uint16 cm -> m) and
    calibration branch but never ships the dataset class; this completes
    the surface using the published VKITTI2 layout
    (Scene*/<variation>/frames/{rgb,depth}/Camera_{0,1}) and rig
    (focal 725.0087 px, baseline 0.532725 m)."""

    VKITTI2_FOCAL = 725.0087
    VKITTI2_BASELINE = 0.532725

    def __init__(self, aug_params=None, root="datasets/vkitti2",
                 variation="clone", sample_len=-1):
        super().__init__(aug_params)
        self.sample_len = sample_len
        self.depth_reader = frame_utils.read_vkitti2_depth
        scale = self.VKITTI2_FOCAL * self.VKITTI2_BASELINE
        for scene in sorted(glob(osp.join(root, "Scene*"))):
            base = osp.join(scene, variation, "frames")
            lefts = sorted(glob(osp.join(base, "rgb", "Camera_0", "rgb_*.jpg")))
            if not lefts:
                continue
            rights = [p.replace("Camera_0", "Camera_1") for p in lefts]
            depths = [
                osp.join(
                    base, "depth", "Camera_0",
                    osp.basename(p).replace("rgb_", "depth_").replace(".jpg", ".png"),
                )
                for p in lefts
            ]
            step = self.sample_len if self.sample_len > 0 else len(lefts)
            for ref in range(0, len(lefts), step):
                sample = defaultdict(lambda: defaultdict(list))
                for idx in range(ref, min(ref + step, len(lefts))):
                    sample["image"]["left"].append(lefts[idx])
                    sample["image"]["right"].append(rights[idx])
                    sample["depth"]["left"].append(depths[idx])
                sample["depth2disp_scale"] = scale
                self.sample_list.append(sample)
                self.extra_info.append(f"{osp.basename(scene)}/{variation}")


class DynamicReplicaDataset(StereoSequenceDataset):
    """Dynamic Replica: gzip-json frame annotations
    (reference :687-789)."""

    def __init__(
        self,
        aug_params=None,
        root="datasets/dynamic_replica_data",
        split="train",
        sample_len=-1,
        only_first_n_samples=-1,
    ):
        super().__init__(aug_params)
        self.root = root
        self.sample_len = sample_len
        self.split = split
        frame_annotations_file = f"frame_annotations_{split}.jgz"
        path = osp.join(root, split, frame_annotations_file)
        with gzip.open(path, "rt", encoding="utf8") as zipfile:
            frame_annots_list = json.load(zipfile)

        seq_annot = defaultdict(lambda: defaultdict(list))
        for frame_annot in frame_annots_list:
            seq = frame_annot["sequence_name"]
            cam = frame_annot["camera_name"]
            seq_annot[seq][cam].append(frame_annot)

        for seq in sorted(seq_annot.keys()):
            try:
                filenames = defaultdict(lambda: defaultdict(list))
                for cam in ("left", "right"):
                    for framedata in seq_annot[seq][cam]:
                        im_path = osp.join(root, split, framedata["image"]["path"])
                        depth_path = osp.join(root, split, framedata["depth"]["path"])
                        assert osp.isfile(im_path), im_path
                        filenames["image"][cam].append(im_path)
                        filenames["depth"][cam].append(depth_path)
                        filenames["viewpoint"][cam].append(framedata["viewpoint"])
                        filenames["image_size"][cam].append(
                            framedata["image"].get("size")
                        )

                seq_len = len(filenames["image"]["left"])
                print(f"seq {seq}: {seq_len} frames")

                if split == "train":
                    # ref every 3 frames, random temporal stride in [1, 5]
                    for ref_idx in range(0, seq_len, 3):
                        step = 1 if self.sample_len == 1 else int(
                            self.rng.integers(1, 6)
                        )
                        if ref_idx + step * self.sample_len < seq_len:
                            sample = defaultdict(lambda: defaultdict(list))
                            for cam in ("left", "right"):
                                for idx in range(
                                    ref_idx, ref_idx + step * self.sample_len, step
                                ):
                                    for k in ("image", "depth"):
                                        sample[k][cam].append(filenames[k][cam][idx])
                            sample["depth2disp_scale"] = self._d2d_scale(filenames)
                            self.sample_list.append(sample)
                else:
                    step = self.sample_len if self.sample_len > 0 else seq_len
                    counter = 0
                    for ref_idx in range(0, seq_len, step):
                        sample = defaultdict(lambda: defaultdict(list))
                        for cam in ("left", "right"):
                            for idx in range(ref_idx, ref_idx + step):
                                if idx >= seq_len:
                                    break
                                for k in ("image", "depth"):
                                    sample[k][cam].append(filenames[k][cam][idx])
                        sample["depth2disp_scale"] = self._d2d_scale(filenames)
                        self.sample_list.append(sample)
                        self.extra_info.append(seq)
                        counter += 1
                        if only_first_n_samples > 0 and counter >= only_first_n_samples:
                            break
            except Exception as e:
                logging.warning(f"skipping sequence {seq}: {e}")

    @staticmethod
    def _d2d_scale(filenames) -> float:
        """focal_px * baseline, matching the reference's pytorch3d chain
        exactly (datasets:254-269 -> eval_utils.py:101-113 ->
        opencv_from_cameras_projection), collapsed to closed form:

          NDC->px:  fx_px = fx_ndc * rescale_x where rescale_x depends on
                    the annotation's intrinsics_format
                    ('ndc_norm_image_bounds' -> W/2, 'ndc_isotropic' ->
                    min(W, H)/2 — dynamic_stereo_datasets.py:166-175);
          px->pytorch3d-NDC->opencv round-trips exactly at scale=1 with
                    the same image size, so fx_px survives unchanged;
          baseline: opencv tvec negates x, so
                    fix_baseline = t_cv_l_x - t_cv_r_x = T_r[0] - T_l[0].
        """
        vp_l = filenames["viewpoint"]["left"][0]
        vp_r = filenames["viewpoint"]["right"][0]
        size = (filenames.get("image_size", {}).get("left") or [None])[0]
        if size is None:
            size = (720, 1280)  # DR native (H, W)
        h, w = float(size[0]), float(size[1])
        fmt = str(vp_l.get("intrinsics_format", "ndc_norm_image_bounds")).lower()
        if fmt == "ndc_norm_image_bounds":
            rescale_x = w / 2.0
        elif fmt == "ndc_isotropic":
            rescale_x = min(w, h) / 2.0
        else:
            raise ValueError(f"unknown intrinsics_format: {fmt}")
        focal_px = float(vp_l["focal_length"][0]) * rescale_x
        baseline = float(vp_r["T"][0]) - float(vp_l["T"][0])
        return focal_px * baseline


class InfinigenStereoVideoDataset(StereoSequenceDataset):
    """Infinigen renders: camera npz + npy depth (reference :792-875)."""

    def __init__(self, aug_params=None, root="datasets/infinigen", sample_len=-1):
        super().__init__(aug_params)
        self.sample_len = sample_len
        for scene in sorted(glob(osp.join(root, "*"))):
            lefts = sorted(glob(osp.join(scene, "frames/Image/camera_0/*.png")))
            rights = sorted(glob(osp.join(scene, "frames/Image/camera_1/*.png")))
            depths = sorted(glob(osp.join(scene, "frames/Depth/camera_0/*.npy")))
            if not lefts or len(lefts) != len(rights):
                continue
            cam_files = sorted(glob(osp.join(scene, "frames/camview/camera_0/*.npz")))
            scale = 1.0
            if cam_files:
                cam = np.load(cam_files[0])
                k = cam["K"] if "K" in cam else None
                baseline = float(cam["baseline"]) if "baseline" in cam else 0.075
                scale = (float(k[0, 0]) if k is not None else 1.0) * baseline
            step = self.sample_len if self.sample_len > 0 else len(lefts)
            for ref in range(0, len(lefts), step):
                sample = defaultdict(lambda: defaultdict(list))
                for idx in range(ref, min(ref + step, len(lefts))):
                    sample["image"]["left"].append(lefts[idx])
                    sample["image"]["right"].append(rights[idx])
                    if depths:
                        sample["depth"]["left"].append(depths[idx])
                sample["depth2disp_scale"] = scale
                self.sample_list.append(sample)
                self.extra_info.append(osp.basename(scene))


class SouthKensingtonStereoVideoDataset(StereoSequenceDataset):
    """Real ZED captures, no GT (reference :878-1000)."""

    def __init__(self, aug_params=None, root="datasets/southkensington", sample_len=-1):
        super().__init__(aug_params)
        self.sample_len = sample_len
        self.split = "test"
        for scene in sorted(glob(osp.join(root, "*"))):
            lefts, rights = self._scene_images(scene)
            if not lefts or len(lefts) != len(rights):
                continue
            step = self.sample_len if self.sample_len > 0 else len(lefts)
            for ref in range(0, len(lefts), step):
                sample = defaultdict(lambda: defaultdict(list))
                for idx in range(ref, min(ref + step, len(lefts))):
                    sample["image"]["left"].append(lefts[idx])
                    sample["image"]["right"].append(rights[idx])
                self.sample_list.append(sample)
                self.extra_info.append(osp.basename(scene))

    @staticmethod
    def _scene_images(scene):
        """Reference layout `<scene>/images/{left,right}` (:899) plus the
        flat fallbacks."""
        for pat_l, pat_r in (
            ("images/left/*.png", "images/right/*.png"),
            ("left/*.png", "right/*.png"),
            ("image_left/*.png", "image_right/*.png"),
        ):
            lefts = sorted(glob(osp.join(scene, pat_l)))
            rights = sorted(glob(osp.join(scene, pat_r)))
            if lefts:
                return lefts, rights
        return [], []


class SouthKensingtonStereoVideoSubDataset(StereoSequenceDataset):
    """One named SouthKensington capture (reference :944-1000): the
    `<root>/<dtype>/<subname>` sub-tree instead of every scene."""

    def __init__(self, aug_params=None, root="datasets/southkensington",
                 dtype="indoor", subname="video010", sample_len=-1,
                 only_first_n_samples=-1):
        super().__init__(aug_params)
        self.sample_len = sample_len
        self.split = "test"
        scene = osp.join(root, dtype, subname)
        lefts, rights = SouthKensingtonStereoVideoDataset._scene_images(scene)
        if not lefts or len(lefts) != len(rights):
            raise FileNotFoundError(f"no stereo frames under {scene}")
        seq_len = len(lefts)
        step = sample_len if 0 < sample_len < seq_len else seq_len
        counter = 0
        for ref in range(0, seq_len, step):
            sample = defaultdict(lambda: defaultdict(list))
            for idx in range(ref, min(ref + step, seq_len)):
                sample["image"]["left"].append(lefts[idx])
                sample["image"]["right"].append(rights[idx])
            self.sample_list.append(sample)
            self.extra_info.append(subname)
            counter += 1
            if only_first_n_samples > 0 and counter >= only_first_n_samples:
                break


class KITTIDepthDataset(StereoSequenceDataset):
    """KITTI sparse LiDAR depth, CODD splits (reference :1003-1114)."""

    KITTI_BASELINE = 0.54  # meters, rectified stereo rig

    def __init__(self, aug_params=None, root="datasets/kitti_depth", split="train",
                 sample_len=-1):
        super().__init__(aug_params, sparse=True)
        self.sample_len = sample_len
        self.split = split
        split_dir = "train" if split == "train" else "val"
        drives = sorted(glob(osp.join(root, split_dir, "*")))
        for drive in drives:
            lefts = sorted(
                glob(osp.join(drive, "proj_depth/groundtruth/image_02/*.png"))
            )
            if not lefts:
                continue
            sample = defaultdict(lambda: defaultdict(list))
            for depth_l in lefts:
                frame = osp.basename(depth_l)
                date = osp.basename(drive)[:10]
                img_l = osp.join(root, "raw", date, osp.basename(drive),
                                 "image_02/data", frame)
                img_r = osp.join(root, "raw", date, osp.basename(drive),
                                 "image_03/data", frame)
                if not (osp.isfile(img_l) and osp.isfile(img_r)):
                    continue
                sample["image"]["left"].append(img_l)
                sample["image"]["right"].append(img_r)
                sample["depth"]["left"].append(depth_l)
            if sample["image"]["left"]:
                sample["depth2disp_scale"] = 721.5377 * self.KITTI_BASELINE
                self.sample_list.append(sample)
                self.extra_info.append(osp.basename(drive))


class SyntheticStereoDataset(StereoSequenceDataset):
    """Procedural stereo clips with exact analytic disparity.

    Textured fronto-parallel layers drifting over time; the right view is
    the left view warped by the (constant-per-layer) disparity. Lets every
    harness component (loader, augmentor, trainer, evaluator, bench) run
    without datasets on disk. Not part of the reference — a framework
    testing facility.
    """

    def __init__(self, aug_params=None, num_seqs=4, sample_len=5, height=256,
                 width=384, seed=0):
        super().__init__(aug_params)
        self.sample_len = sample_len
        self.height, self.width = height, width
        self._seed = seed
        self.sample_list = list(range(num_seqs))
        self.extra_info = [f"synthetic_{i}" for i in range(num_seqs)]

    def _load_sample(self, sample):
        idx = int(sample)
        rng = np.random.default_rng(self._seed + idx)
        t, h, w = self.sample_len, self.height, self.width

        n_layers = 3
        disps = np.sort(rng.uniform(4, 48, n_layers))[::-1]  # near -> far
        textures = [
            rng.integers(0, 255, (h, w + 128, 3)).astype(np.uint8)
            for _ in range(n_layers)
        ]
        # smooth the noise so photometric matching is meaningful
        try:
            import cv2

            textures = [cv2.GaussianBlur(tx, (0, 0), 3) for tx in textures]
        except ImportError:
            pass
        masks = []
        yy, xx = np.mgrid[0:h, 0:w]
        for li in range(n_layers - 1):
            cx, cy = rng.uniform(0.2, 0.8) * w, rng.uniform(0.2, 0.8) * h
            r = rng.uniform(0.15, 0.3) * min(h, w)
            masks.append(((xx - cx) ** 2 + (yy - cy) ** 2) < r * r)
        drift = rng.integers(1, 4, n_layers)

        imgs, dmaps = [], []
        for ti in range(t):
            left = np.empty((h, w, 3), np.uint8)
            right = np.empty((h, w, 3), np.uint8)
            dmap = np.empty((h, w), np.float32)
            # far-to-near composition
            for li in range(n_layers - 1, -1, -1):
                off = int(ti * drift[li])
                tex = np.roll(textures[li], off, axis=1)
                d = int(round(disps[li]))
                # right camera sees the scene shifted left by d:
                # right[x] = left[x + d]  =>  left[x] == right[x - d]
                layer_l = tex[:, 64 : 64 + w]
                layer_r = tex[:, 64 + d : 64 + d + w]
                if li == n_layers - 1:
                    region = np.ones((h, w), bool)
                else:
                    region = masks[li]
                left[region] = layer_l[region]
                right[region] = layer_r[region]
                dmap[region] = disps[li]
            imgs.append(np.stack([left, right]))
            dmaps.append(np.stack([-dmap, np.zeros_like(dmap)], axis=-1))

        imgs = np.stack(imgs)
        disp = np.stack(dmaps)[:, None]
        valid = np.ones((t, 1, h, w), np.float32)
        return {"img": imgs, "disp": disp, "valid": valid}


def fetch_dataloader(
    crop_size=(320, 512),
    sample_len=5,
    batch_size=2,
    num_workers=4,
    sceneflow_root="datasets/SceneFlow",
    dynamic_replica_root="datasets/dynamic_replica_data",
    use_synthetic_fallback=True,
    seed=0,
):
    """Training mixture (reference dynamic_stereo_datasets.py:1407-1487):
    SceneFlow(final) + DynamicReplica(train), x50 repetition, shuffled.
    Falls back to the synthetic dataset when no data is on disk."""
    from ppmstereo_tpu.data.loader import PrefetchLoader

    aug_params = {
        "crop_size": crop_size,
        "min_scale": -0.2,
        "max_scale": 0.4,
        "yjitter": True,
        "saturation_range": (0.0, 1.4),
    }
    parts = []
    if osp.isdir(sceneflow_root):
        parts.append(
            SequenceSceneFlowDataset(
                aug_params, root=sceneflow_root, dstype="frames_finalpass",
                sample_len=sample_len,
            )
        )
    if osp.isdir(osp.join(dynamic_replica_root, "train")):
        parts.append(
            DynamicReplicaDataset(
                aug_params, root=dynamic_replica_root, split="train",
                sample_len=sample_len,
            )
        )
    if not parts:
        if not use_synthetic_fallback:
            raise FileNotFoundError("no training datasets found")
        logging.warning("no datasets on disk; using SyntheticStereoDataset")
        parts = [
            SyntheticStereoDataset(
                aug_params, num_seqs=64, sample_len=sample_len,
                height=crop_size[0] + 32, width=crop_size[1] + 64,
            )
        ]

    dataset = parts[0]
    for p in parts[1:]:
        dataset = dataset + p
    dataset = dataset * 50

    return PrefetchLoader(
        dataset, batch_size=batch_size, shuffle=True, num_workers=num_workers,
        seed=seed,
    )
