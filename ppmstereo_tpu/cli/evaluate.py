"""Evaluation entry point.

Mirrors /root/reference/evaluation/evaluate.py:60-141 (hydra run_eval):
dataset selection (dynamicreplica / sintel / things / real), model zoo
resolution with MODEL.model_name-style overrides, sequence evaluation,
JSON dump.

    python -m ppmstereo_tpu.cli.evaluate --config ppmstereo_tpu/configs/eval_dynamic_replica_40_frames.yaml \
        MODEL.model_name=PPMStereoModel
"""

from __future__ import annotations

import argparse
import logging
import os
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    model_name: str = "PPMStereoModel"
    kernel_size: int = 20
    iters: int = 20
    checkpoint: str = ""
    fast_mode: bool = False  # non-overlapping windows (~2x, non-parity)
    batch_windows: int = 1  # windows per device call (parity-safe)
    # multi-chip strict-parity inference: shard EACH window over a
    # (data, seq, space) mesh — "MODEL.mesh=1x2x4" spreads one window
    # over 8 chips (frames over seq, rows over space; exact vs the
    # sequential driver — tests/test_sharded_inference.py). Empty = off.
    mesh: str = ""
    # extra model-constructor kwargs as "k=v,k2=v2" (values literal-eval'd),
    # e.g. MODEL.model_kwargs="use_cnet=False,top_k=2" — the analog of the
    # reference's open MODEL.* hydra namespace (evaluate.py:30-58)
    model_kwargs: str = ""


def _parse_model_kwargs(spec: str) -> dict:
    import ast

    out = {}
    for item in filter(None, (s.strip() for s in spec.split(","))):
        k, _, v = item.partition("=")
        try:
            out[k.strip()] = ast.literal_eval(v.strip())
        except (ValueError, SyntaxError):
            out[k.strip()] = v.strip()
    return out


@dataclass
class DefaultConfig:
    exp_dir: str = "./outputs/eval"
    dataset_name: str = "dynamicreplica"  # | sintel | things | synthetic
    dstype: str = "clean"  # sintel pass
    dataset_root: str = "datasets"
    sample_len: int = 40
    only_first_n_samples: int = 1
    crop: int = 0
    MODEL: ModelConfig = field(default_factory=ModelConfig)


def build_dataset(cfg: DefaultConfig):
    from ppmstereo_tpu.data import datasets as D

    name = cfg.dataset_name
    if name == "dynamicreplica":
        return D.DynamicReplicaDataset(
            root=f"{cfg.dataset_root}/dynamic_replica_data", split="valid",
            sample_len=cfg.sample_len,
            only_first_n_samples=cfg.only_first_n_samples,
        )
    if name == "sintel":
        return D.SequenceSintelStereo(
            dstype=cfg.dstype, root=f"{cfg.dataset_root}/sintel_stereo"
        )
    if name == "things":
        return D.SequenceSceneFlowDataset(
            root=f"{cfg.dataset_root}/SceneFlow", dstype="frames_finalpass",
            sample_len=cfg.sample_len, things_test=True,
        )
    if name == "synthetic":
        return D.SyntheticStereoDataset(
            num_seqs=2, sample_len=cfg.sample_len, height=256, width=384
        )
    if name == "infinigen":
        return D.InfinigenStereoVideoDataset(
            root=f"{cfg.dataset_root}/infinigen_stereo", sample_len=cfg.sample_len
        )
    if name == "kitti":
        return D.KITTIDepthDataset(
            root=f"{cfg.dataset_root}/kitti_depth", split="val",
            sample_len=cfg.sample_len,
        )
    raise ValueError(f"unknown dataset {name}")


# the reference's hard-coded real ZED capture sequences
# (evaluation/evaluate.py:96-113)
REAL_SEQUENCES = ("teddy_static", "ignacio_waving", "nikita_reading")


def _run_real_eval(cfg: DefaultConfig, predictor, evaluator):
    """Mirror of the reference's dataset_name == 'real' branch: iterate
    DynamicReplica-format real captures (no GT -> fps-only metrics)."""
    from ppmstereo_tpu.data import datasets as D
    from ppmstereo_tpu.evaluation.evaluator import pretty_print_results

    all_results = {}
    for seq_name in REAL_SEQUENCES:
        root = f"{cfg.dataset_root}/dynamic_replica_data/real/{seq_name}"
        if not os.path.isdir(root):
            logging.warning(f"real sequence {root} not found; skipping")
            continue
        ds = D.DynamicReplicaDataset(
            root=root, split="test", sample_len=cfg.sample_len,
            only_first_n_samples=1,
        )
        results = evaluator.evaluate_sequence(predictor, ds)
        evaluator.dump(results, f"real_{seq_name}")
        pretty_print_results(results)
        all_results[seq_name] = results
    return all_results


def run_eval(cfg: DefaultConfig):
    from ppmstereo_tpu.evaluation.evaluator import (
        EvalConfig,
        Evaluator,
        pretty_print_results,
    )
    from ppmstereo_tpu.models.zoo import model_zoo

    mesh = None
    if cfg.MODEL.mesh:
        from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh

        data, seq, space = (int(s) for s in cfg.MODEL.mesh.split("x"))
        # eval image sizes are dataset-dependent and unknown here; safe
        # at every shape — stages with tiny space shards replicate
        # their rows in-model (models/ppm_stereo.py::_tiny_row_shards)
        mesh = make_mesh(MeshSpec(data=data, seq=seq, space=space))

    predictor = model_zoo(
        cfg.MODEL.model_name,
        kernel_size=cfg.MODEL.kernel_size,
        iters=cfg.MODEL.iters,
        fast_mode=cfg.MODEL.fast_mode,
        batch_windows=cfg.MODEL.batch_windows,
        mesh=mesh,
        **_parse_model_kwargs(cfg.MODEL.model_kwargs),
    )
    if cfg.MODEL.checkpoint:
        from ppmstereo_tpu.train.checkpoints import load_params

        predictor.load_params(load_params(cfg.MODEL.checkpoint, predictor.params))

    evaluator = Evaluator(EvalConfig(exp_dir=cfg.exp_dir, crop=cfg.crop))
    if cfg.dataset_name == "real":
        return _run_real_eval(cfg, predictor, evaluator)

    dataset = build_dataset(cfg)
    results = evaluator.evaluate_sequence(predictor, dataset)
    path = evaluator.dump(results, cfg.dataset_name)
    pretty_print_results(results)
    logging.info(f"results -> {path}")
    return results


def _apply_platform(platform: str | None):
    """Explicit jax platform override. The hosting environment may pin a
    platform via env/sitecustomize before argv is seen, so an env var is
    not enough — update jax.config before first backend use."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None):
    p = argparse.ArgumentParser("ppmstereo_tpu.evaluate")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu|tpu|axon)")
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    _apply_platform(args.platform)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from ppmstereo_tpu.utils.config import apply_overrides, load_yaml

    if args.config:
        cfg = load_yaml(DefaultConfig, args.config, overrides=args.overrides)
    else:
        cfg = DefaultConfig()
        apply_overrides(cfg, args.overrides)
    run_eval(cfg)


if __name__ == "__main__":
    main()
