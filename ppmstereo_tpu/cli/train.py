"""Training entry point.

Mirrors /root/reference/train.py:356-500 (argparse -> Lite.run): same
flag names where they exist, config-file + dotted overrides on top.

    python -m ppmstereo_tpu.cli.train --name ppmstereo --num_steps 200000 \
        --batch_size 2 --lr 0.0003 --sample_len 5 --train_iters 10
"""

from __future__ import annotations

import argparse
import logging


def _apply_platform(platform: str | None):
    """Explicit jax platform override. The hosting environment may pin a
    platform via env/sitecustomize before argv is seen, so an env var is
    not enough — update jax.config before first backend use."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None):
    p = argparse.ArgumentParser("ppmstereo_tpu.train")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu|tpu|axon)")
    p.add_argument("--name", default="ppmstereo",
                   help="ppmstereo | ppmstereo_vda | dynamicstereo | bidastereo | stereoanyvideo")
    p.add_argument("--config", default=None, help="YAML TrainConfig preset")
    p.add_argument("--ckpt_path", default="./outputs/train")
    p.add_argument("--num_steps", type=int, default=200_000)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sample_len", type=int, default=5)
    p.add_argument("--train_iters", type=int, default=10)
    p.add_argument("--image_size", type=int, nargs=2, default=[320, 512])
    p.add_argument("--no_mixed_precision", action="store_true")
    p.add_argument("--evaluate_freq", type=int, default=5000)
    p.add_argument("--save_freq", type=int, default=5000)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--seq_parallel", type=int, default=1)
    p.add_argument("--space_parallel", type=int, default=1)
    p.add_argument("overrides", nargs="*", help="dotted KEY=VALUE overrides")
    args = p.parse_args(argv)
    _apply_platform(args.platform)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from ppmstereo_tpu.train.trainer import TrainConfig, train
    from ppmstereo_tpu.utils.config import apply_overrides, load_yaml

    if args.config:
        cfg = load_yaml(TrainConfig, args.config, overrides=args.overrides)
    else:
        cfg = TrainConfig(
            model_name=args.name,
            num_steps=args.num_steps,
            batch_size=args.batch_size,
            lr=args.lr,
            sample_len=args.sample_len,
            train_iters=args.train_iters,
            crop_size=tuple(args.image_size),
            mixed_precision=not args.no_mixed_precision,
            exp_dir=args.ckpt_path,
            eval_freq=args.evaluate_freq,
            save_freq=args.save_freq,
            num_workers=args.num_workers,
            seed=args.seed,
            data_parallel=args.data_parallel,
            seq_parallel=args.seq_parallel,
            space_parallel=args.space_parallel,
        )
        apply_overrides(cfg, args.overrides)

    train(cfg)


if __name__ == "__main__":
    main()
