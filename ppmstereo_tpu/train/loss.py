"""Sequence loss over all refinement iterations + train metrics.

Parity with /root/reference/train_utils/losses.py:10-84 (sequence_loss):
gamma-weighted L1 over every iteration output with
adjusted_gamma = gamma^(15/(n-1)), valid-mask + max-flow exclusion, and the
optional uncertainty target |exp(-0.9*|err|/7) + 1e-2 - pred_unc|.

Masked means are computed as sum(x*mask)/sum(mask) — no boolean
compaction, so everything stays shape-static under jit and shards cleanly
(a masked_select would be data-dependent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    num = jnp.sum(x * mask)
    den = jnp.maximum(jnp.sum(mask), 1.0)
    return num / den


def sequence_loss(
    flow_preds: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array,
    uncertainties: jax.Array | None = None,
    loss_gamma: float = 0.9,
    max_flow: float = 700.0,
):
    """flow_preds: (N_iters, B, T, H, W, 1) disparity-x predictions.
    flow_gt: (B, T, H, W, C_gt) with the x component first.
    valid: (B, T, H, W) or (B, T, H, W, 1) mask.
    uncertainties: optional (N_iters, B, T, H, W, 1).

    Returns (loss, metrics dict of traced scalars).
    """
    flow_preds = flow_preds.astype(jnp.float32)
    flow_gt = flow_gt.astype(jnp.float32)[..., :1]

    if valid.ndim == flow_gt.ndim - 1:
        valid = valid[..., None]
    valid = valid.astype(jnp.float32)

    mag = jnp.abs(flow_gt)
    valid = valid * (mag < max_flow).astype(jnp.float32)

    n_predictions = flow_preds.shape[0]
    if n_predictions > 1:
        adjusted_gamma = loss_gamma ** (15.0 / (n_predictions - 1))
        weights = adjusted_gamma ** jnp.arange(n_predictions - 1, -1, -1, dtype=jnp.float32)
    else:
        weights = jnp.ones((1,), jnp.float32)

    err = jnp.abs(flow_preds - flow_gt[None])  # (N, B, T, H, W, 1)
    if uncertainties is not None:
        gt_unc = jnp.exp(-0.9 * err / 7.0) + 1e-2
        per_iter = err + jnp.abs(gt_unc - uncertainties.astype(jnp.float32))
    else:
        per_iter = err

    per_iter_mean = jax.vmap(lambda e: _masked_mean(e, valid))(per_iter)
    flow_loss = jnp.sum(weights * per_iter_mean)

    epe = jnp.abs(flow_preds[-1] - flow_gt)
    metrics = {
        "epe": _masked_mean(epe, valid),
        "1px": _masked_mean((epe > 1).astype(jnp.float32), valid) * 100,
        "3px": _masked_mean((epe > 3).astype(jnp.float32), valid) * 100,
        "5px": _masked_mean((epe > 5).astype(jnp.float32), valid) * 100,
    }
    return flow_loss, metrics
