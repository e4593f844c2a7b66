"""Sequence evaluator: whole-video inference + EPE/TEPE aggregation.

Re-design of /root/reference/evaluation/core/evaluator.py
(Evaluator.evaluate_sequence): iterate a dataset of full sequences, build
the stereo-video batch, run the model's sliding-window driver, compute
masked EPE / temporal-EPE / bad-px metrics per sequence, and aggregate
with sequence-length weighting (evaluation/utils/utils.py:119-139).
Results are dumped as JSON (train_utils/utils.py:81-87 convention).
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass

import numpy as np

from ppmstereo_tpu.evaluation.metrics import (
    aggregate_sequence_results,
    eval_endpoint_error_sequence,
)


@dataclass
class EvalConfig:
    exp_dir: str = "./outputs"
    sample_len: int = 40
    kernel_size: int = 20
    iters: int = 20
    crop: int = 0
    only_first_n_samples: int = -1
    visualize: bool = False


class Evaluator:
    def __init__(self, cfg: EvalConfig | None = None):
        self.cfg = cfg or EvalConfig()

    def evaluate_sequence(self, predictor, dataset, writer=None) -> dict:
        """predictor: zoo StereoVideoPredictor-like callable on
        {"stereo_video": (N,2,H,W,3)}. dataset yields samples with
        img (T,2,H,W,3), disp (T,1,H,W,1), valid (T,1,H,W)."""
        per_seq, lengths, per_seq_results = [], [], []
        for i in range(len(dataset)):
            sample = dataset[i]
            video = sample["img"]  # (T,2,H,W,3)
            t0 = time.perf_counter()
            out = predictor({"stereo_video": video})
            dt = time.perf_counter() - t0

            seq_len = len(video)
            if self.cfg.visualize:
                # reference gate: visualize_interval > 0 writes rotated
                # point-cloud reconstruction videos per sequence
                # (evaluator.py:101-138 -> utils.py:292-442); here the
                # numpy renderer + variance-masked mean views
                from ppmstereo_tpu.evaluation.visualization import (
                    save_reconstruction_views,
                )

                vis_dir = os.path.join(self.cfg.exp_dir, "visualisations")
                save_reconstruction_views(
                    np.abs(out["disparity"][..., 0]),
                    video[:, 0].astype(np.uint8),
                    vis_dir,
                    sequence_name=f"seq_{i}",
                )
            if "disp" in sample and sample["disp"] is not None:
                gt = np.abs(sample["disp"][:, 0])  # (T,H,W,1), |neg-x flow|
                mask = sample["valid"][:, 0][..., None]
                import jax.numpy as jnp

                results = eval_endpoint_error_sequence(
                    jnp.asarray(out["disparity"]),
                    jnp.asarray(gt),
                    jnp.asarray(mask),
                    crop=self.cfg.crop,
                )
                results = {k: float(v) for k, v in results.items()}
            else:
                results = {}
            results["fps"] = seq_len / max(dt, 1e-9)
            name = (
                dataset.extra_info[i]
                if getattr(dataset, "extra_info", None)
                else f"seq_{i}"
            )
            logging.info(f"[eval] {name}: {results}")
            per_seq.append(results)
            lengths.append(seq_len)
            per_seq_results.append({"name": str(name), **results})

        agg = aggregate_sequence_results(per_seq, lengths)
        agg["num_sequences"] = len(per_seq)
        return {"aggregate": agg, "per_sequence": per_seq_results}

    def dump(self, results: dict, dataset_name: str, step: int | str = "final"):
        os.makedirs(self.cfg.exp_dir, exist_ok=True)
        path = os.path.join(self.cfg.exp_dir, f"result_{dataset_name}_{step}.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
        return path


def pretty_print_results(results: dict):
    """Tabulated metric printer (reference evaluation/utils/utils.py:156-165)."""
    agg = results.get("aggregate", results)
    width = max((len(k) for k in agg), default=10) + 2
    lines = ["-" * (width + 14)]
    for k in sorted(agg):
        v = agg[k]
        lines.append(f"{k:<{width}}| {v:>10.4f}" if isinstance(v, float) else f"{k:<{width}}| {v}")
    lines.append("-" * (width + 14))
    print("\n".join(lines))
