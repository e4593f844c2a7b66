"""Train state: optimizer, schedule, frozen-backbone partition.

Parity with the reference recipe (/root/reference/train.py:41-54,275-280):
AdamW(lr=3e-4, wd=1e-5, eps=1e-8), OneCycleLR(linear, pct_start=0.01,
total=num_steps+100), global grad-norm clip 0.99, frozen ConvNeXt
backbone (train.py:161-163) and zero-weight-decay time_embed
(ppmstereo.py:175-177) — expressed as an optax transform partition
instead of param-group surgery.
"""

from __future__ import annotations


import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def onecycle_schedule(num_steps: int, lr: float = 3e-4) -> optax.Schedule:
    return optax.linear_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=lr,
        pct_start=0.01,
        pct_final=1.0,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def _param_label(path: tuple[str, ...]) -> str:
    joined = "/".join(path)
    if "cnet/convnext" in joined:
        return "frozen"
    if path[-2:] == ("time_embed",) or path[-1] == "time_embed":
        return "no_decay"
    return "train"


def make_optimizer(
    num_steps: int = 200_000,
    lr: float = 3e-4,
    weight_decay: float = 1e-5,
    clip_norm: float = 0.99,
    nan_guard: bool = True,
) -> optax.GradientTransformation:
    schedule = onecycle_schedule(num_steps, lr)

    def adamw(wd):
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd),
        )

    tx = optax.multi_transform(
        {
            "train": adamw(weight_decay),
            "no_decay": adamw(0.0),
            "frozen": optax.set_to_zero(),
        },
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: _param_label(
                tuple(
                    p.key if hasattr(p, "key") else str(p) for p in path
                )
            ),
            params,
        ),
    )
    if nan_guard:
        # failure detection the reference only has as commented-out code
        # (train.py:255-271): a non-finite gradient skips the update
        # instead of poisoning the params; 10 consecutive failures raise.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)
    return tx


def create_train_state(
    model, params, num_steps: int = 200_000, lr: float = 3e-4
) -> TrainState:
    tx = make_optimizer(num_steps=num_steps, lr=lr)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
