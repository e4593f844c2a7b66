"""Sharding rules: how batches, params and optimizer state map to the mesh."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> dict[str, NamedSharding]:
    """Training batch: clips over `data`, frames over `seq`, rows over
    `space`. Video tensors are (B, T, H, W, C); valid masks (B, T, H, W)."""
    video = NamedSharding(mesh, P("data", "seq", "space"))
    return {
        "left": video,
        "right": video,
        "disparity": video,
        "valid": video,
    }


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    spec = batch_sharding(mesh)
    return {
        k: jax.device_put(v, spec.get(k, replicate(mesh))) for k, v in batch.items()
    }
