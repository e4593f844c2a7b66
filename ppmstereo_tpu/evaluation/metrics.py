"""EPE / temporal-EPE metric suite.

Parity with /root/reference/evaluation/utils/eval_utils.py:34-98
(eval_endpoint_error_sequence): masked per-pixel endpoint error, the
temporal-EPE of frame-difference fields, and bad-0.5/1/2/3px rates,
normalized by the count of NONZERO error pixels (the reference quirk at
:75-79 — zero-error pixels are excluded from the denominator).

Pure jnp; runs on device and psum-reduces cleanly for multi-host eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_endpoint_error_sequence(
    x: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    crop: int = 0,
    mask_thr: float = 0.5,
    clamp_thr: float = 1e-5,
) -> dict[str, jax.Array]:
    """x (pred), y (gt): (T, H, W, C); mask: (T, H, W, 1) in [0, 1]."""
    assert x.ndim == y.ndim == mask.ndim == 4

    if crop > 0:
        x = x[:, crop:-crop, crop:-crop]
        y = y[:, crop:-crop, crop:-crop]
        mask = mask[:, crop:-crop, crop:-crop]

    x = x.astype(jnp.float32)
    y = jnp.nan_to_num(y.astype(jnp.float32), nan=0.0)
    mask = mask.astype(jnp.float32)

    gate = (mask > mask_thr).astype(jnp.float32)
    y = y * gate
    x = x * gate

    results = {}
    for name in ("epe", "temp_epe"):
        if name == "epe":
            err = jnp.sqrt(jnp.sum(mask * (x - y) ** 2, axis=-1))
        else:
            dmask = mask[:-1] * mask[1:]
            diff = (x[:-1] - x[1:]) - (y[:-1] - y[1:])
            err = jnp.sqrt(jnp.sum(dmask * diff**2, axis=-1))

        nonzero = jnp.maximum(
            jnp.count_nonzero(err).astype(jnp.float32), clamp_thr
        )
        results[f"{name}_mean"] = jnp.sum(err) / nonzero
        for thr, key in ((0.5, "0.5px"), (1.0, "1px"), (2.0, "2px"), (3.0, "3px")):
            results[f"{name}_bad_{key}"] = (
                jnp.sum((err > thr).astype(jnp.float32)) / nonzero * 100.0
            )
    return results


def aggregate_sequence_results(
    per_seq: list[dict[str, float]], lengths: list[int]
) -> dict[str, float]:
    """Sequence-length-weighted mean over evaluated sequences
    (reference evaluation/utils/utils.py:119-139)."""
    if not per_seq:
        return {}
    total = float(sum(lengths))
    keys = per_seq[0].keys()
    return {
        k: float(sum(r[k] * l for r, l in zip(per_seq, lengths)) / total)
        for k in keys
    }
