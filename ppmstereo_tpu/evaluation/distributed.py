"""Multi-host evaluation: shard sequences across hosts, psum-aggregate.

The reference evaluates on one GPU only. Here each host evaluates its own
shard of the sequence list and the length-weighted metric sums reduce
with a psum over the `data` axis (SURVEY.md §7.6) — the distributed
mirror of evaluation/utils/utils.py:119-139.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def shard_sequences(num_sequences: int, process_index: int, process_count: int):
    """Contiguous split of sequence indices across hosts."""
    return list(range(process_index, num_sequences, process_count))


def allreduce_weighted_metrics(
    local_sums: dict[str, float], local_weight: float, mesh: Mesh
) -> dict[str, float]:
    """Sum weighted metric accumulators over every device/host and return
    global means. local_sums values are sum(metric * seq_len)."""
    keys = sorted(local_sums)
    vec = jnp.asarray([local_sums[k] for k in keys] + [local_weight], jnp.float32)

    # each process contributes its own accumulator vector; the host-level
    # all-gather + sum is the whole reduction (devices hold replicas)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(vec)
        vec = jnp.sum(gathered, axis=0)

    total_w = float(vec[-1])
    out = {k: float(vec[i]) / max(total_w, 1e-9) for i, k in enumerate(keys)}
    out["total_frames"] = total_w
    return out


def evaluate_distributed(evaluator, predictor, dataset, mesh: Mesh) -> dict:
    """Each host runs its shard; metrics reduce globally."""
    idxs = shard_sequences(len(dataset), jax.process_index(), jax.process_count())

    local_sums: dict[str, float] = {}
    local_weight = 0.0
    for i in idxs:
        sample = dataset[i]
        out = predictor({"stereo_video": sample["img"]})
        seq_len = len(sample["img"])
        if sample.get("disp") is not None:
            from ppmstereo_tpu.evaluation.metrics import (
                eval_endpoint_error_sequence,
            )

            gt = np.abs(sample["disp"][:, 0])
            mask = sample["valid"][:, 0][..., None]
            res = eval_endpoint_error_sequence(
                jnp.asarray(out["disparity"]), jnp.asarray(gt), jnp.asarray(mask)
            )
            for k, v in res.items():
                local_sums[k] = local_sums.get(k, 0.0) + float(v) * seq_len
        local_weight += seq_len

    return allreduce_weighted_metrics(local_sums, local_weight, mesh)
