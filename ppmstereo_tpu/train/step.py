"""The jitted, mesh-sharded training step.

Replaces the reference's LightningLite/DDP loop body
(/root/reference/train.py:211-280): forward over all refinement
iterations, gamma-weighted sequence loss with the uncertainty term,
grads, clip, AdamW update. Under `jit` with sharded batch inputs the
gradient all-reduce over the `data` axis is inserted by XLA — no NCCL /
GradScaler machinery (bf16 on TPU needs no loss scaling).
"""

from __future__ import annotations


import jax

from ppmstereo_tpu.train.loss import sequence_loss


def make_train_step(model):
    """model: a flax module with apply(params, left, right) ->
    (predictions, uncertainties). Returns jittable step(state, batch)."""

    def step(state, batch):
        def loss_fn(params):
            preds, uncs = model.apply(params, batch["left"], batch["right"])
            loss, metrics = sequence_loss(
                preds, batch["disparity"], batch["valid"], uncertainties=uncs
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        metrics = dict(metrics, loss=loss)
        return state, metrics

    return step


def jit_train_step(model, mesh, batch_shardings, state_sharding):
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_train_step(model)
    return jax.jit(
        step,
        in_shardings=(state_sharding, batch_shardings),
        out_shardings=(state_sharding, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
