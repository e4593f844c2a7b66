"""Demo: stereo frame directories -> colorized disparity videos.

Mirrors /root/reference/demo.py:23-207: read left/right frame dirs, chunk
long videos, run a zoo model, write disparity mp4s (magma colormap) and
optional raw .npz disparities.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np


def read_frames(path: str) -> np.ndarray:
    from PIL import Image

    files = sorted(
        glob.glob(os.path.join(path, "*.png")) + glob.glob(os.path.join(path, "*.jpg"))
    )
    if not files:
        raise FileNotFoundError(f"no frames in {path}")
    return np.stack([np.asarray(Image.open(f))[..., :3] for f in files]).astype(
        np.float32
    )


def colorize(disp: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    import cv2

    vmin = np.percentile(disp, 2) if vmin is None else vmin
    vmax = np.percentile(disp, 98) if vmax is None else vmax
    norm = np.clip((disp - vmin) / max(vmax - vmin, 1e-6), 0, 1)
    return cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_MAGMA)


def _apply_platform(platform: str | None):
    """Explicit jax platform override. The hosting environment may pin a
    platform via env/sitecustomize before argv is seen, so an env var is
    not enough — update jax.config before first backend use."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None):
    p = argparse.ArgumentParser("ppmstereo_tpu.demo")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu|tpu|axon)")
    p.add_argument("--left", required=True, help="left frames directory")
    p.add_argument("--right", required=True, help="right frames directory")
    p.add_argument("--output", default="./outputs/demo")
    p.add_argument("--model", default="PPMStereoModel")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--kernel_size", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--frame_size", type=int, default=150,
                   help="chunk length for long videos (reference demo.py:75-93)")
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--save_npz", action="store_true")
    p.add_argument(
        "--model_kwargs", default="",
        help='extra model-constructor kwargs as "k=v,k2=v2" '
             "(literal-eval'd) — same contract as the evaluate CLI",
    )
    args = p.parse_args(argv)
    _apply_platform(args.platform)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    os.makedirs(args.output, exist_ok=True)

    left = read_frames(args.left)
    right = read_frames(args.right)
    assert left.shape == right.shape, (left.shape, right.shape)
    video = np.stack([left, right], axis=1)  # (N, 2, H, W, 3)

    from ppmstereo_tpu.models.zoo import model_zoo

    from ppmstereo_tpu.cli.evaluate import _parse_model_kwargs

    predictor = model_zoo(
        args.model, kernel_size=args.kernel_size, iters=args.iters,
        **_parse_model_kwargs(args.model_kwargs),
    )
    if args.checkpoint:
        from ppmstereo_tpu.train.checkpoints import load_params

        predictor.load_params(load_params(args.checkpoint, predictor.params))

    disps = []
    for s in range(0, len(video), args.frame_size):
        chunk = video[s : s + args.frame_size]
        out = predictor({"stereo_video": chunk})
        disps.append(out["disparity"])
        logging.info(f"chunk {s}:{s + len(chunk)} done")
    disp = np.concatenate(disps)[..., 0]  # (N, H, W)

    import cv2

    h, w = disp.shape[1:]
    writer = cv2.VideoWriter(
        os.path.join(args.output, "disparity.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (w, h),
    )
    vmin, vmax = np.percentile(disp, 2), np.percentile(disp, 98)
    for frame in disp:
        writer.write(colorize(frame, vmin, vmax))
    writer.release()

    if args.save_npz:
        np.savez_compressed(os.path.join(args.output, "disparity.npz"), disparity=disp)
    logging.info(f"wrote {args.output}/disparity.mp4 ({len(disp)} frames)")


if __name__ == "__main__":
    main()
