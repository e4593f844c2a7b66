"""Training harness: data -> sharded step -> checkpoints -> eval hooks.

Re-design of the reference Lite/DDP loop (/root/reference/train.py:102-352)
as a mesh-sharded JAX loop:

  * model built from the same architecture switches (name, attention_type,
    3-D update blocks, convex-3D — train.py:118-154 / :425-447);
  * AdamW + OneCycle + clip 0.99 + frozen-backbone partition (state.py);
  * one jitted step; gradient all-reduce over the `data` mesh axis is
    XLA-inserted (no NCCL/GradScaler — bf16 needs no loss scaling);
  * periodic Orbax checkpointing (save_freq, after ckpt_after_steps —
    reference saves after 80k, train.py:283-299) and in-training eval;
  * metrics to JSONL/TensorBoard.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh
from ppmstereo_tpu.parallel.sharding import batch_sharding, replicate
from ppmstereo_tpu.train.checkpoints import CheckpointManager
from ppmstereo_tpu.train.state import create_train_state
from ppmstereo_tpu.train.step import make_train_step
from ppmstereo_tpu.utils.logging_utils import MetricsLogger


@dataclass
class TrainConfig:
    # reference defaults: train.py:367-418 + README "Training"
    model_name: str = "ppmstereo"
    num_steps: int = 200_000
    batch_size: int = 2
    lr: float = 3e-4
    sample_len: int = 5
    train_iters: int = 10
    crop_size: tuple = (320, 512)
    mixed_precision: bool = True
    exp_dir: str = "./outputs/train"
    ckpt_after_steps: int = 80_000
    save_freq: int = 5_000
    eval_freq: int = 5_000
    num_workers: int = 4
    seed: int = 0
    # mesh
    data_parallel: int = 0  # 0 = all devices
    seq_parallel: int = 1
    space_parallel: int = 1


def build_train_model(cfg: TrainConfig):
    """Architecture switch (reference train.py:118-154)."""
    name = cfg.model_name
    if name in ("ppmstereo", "memstereo"):
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

        mcfg = PPMStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision
        )
        return PPMStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), True
    if name == "ppmstereo_vda":
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

        mcfg = PPMStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision,
            use_vfm=True,
        )
        return PPMStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), True
    if name == "dynamicstereo":
        from ppmstereo_tpu.models.dynamic_stereo import (
            DynamicStereo,
            DynamicStereoConfig,
        )

        mcfg = DynamicStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision
        )
        return DynamicStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), False
    if name == "bidastereo":
        from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig

        mcfg = BiDAStereoConfig(mixed_precision=cfg.mixed_precision)
        return BiDAStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), False
    if name == "stereoanyvideo":
        from ppmstereo_tpu.models.stereoanyvideo import (
            StereoAnyVideo,
            StereoAnyVideoConfig,
        )

        mcfg = StereoAnyVideoConfig(mixed_precision=cfg.mixed_precision)
        return StereoAnyVideo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), False
    raise ValueError(f"unknown model {name}")


def _wrap_no_uncertainty(model):
    """Uniform train-step contract for models without an uncertainty head."""

    class _Adapter:
        def __init__(self, m):
            self._m = m

        def init(self, *a, **kw):
            return self._m.init(*a, **kw)

        def apply(self, params, left, right):
            preds = self._m.apply(params, left, right)
            return preds, None

    return _Adapter(model)


def train(cfg: TrainConfig, loader=None, max_steps: int | None = None):
    """Run training; returns the final TrainState. `loader` defaults to
    fetch_dataloader (SceneFlow + DynamicReplica, synthetic fallback)."""
    from ppmstereo_tpu.data.datasets import fetch_dataloader

    if loader is None:
        loader = fetch_dataloader(
            crop_size=cfg.crop_size,
            sample_len=cfg.sample_len,
            batch_size=cfg.batch_size,
            num_workers=cfg.num_workers,
            seed=cfg.seed,
        )

    model, has_unc = build_train_model(cfg)
    step_model = model if has_unc else _wrap_no_uncertainty(model)

    n_dev = len(jax.devices())
    if cfg.data_parallel:
        dp = cfg.data_parallel
    else:
        cap = max(1, n_dev // (cfg.seq_parallel * cfg.space_parallel))
        # largest divisor of the global batch that fits the device budget
        dp = max(
            d for d in range(1, min(cap, cfg.batch_size) + 1)
            if cfg.batch_size % d == 0
        )
    mesh = make_mesh(MeshSpec(dp, cfg.seq_parallel, cfg.space_parallel))

    batch0 = next(iter(loader))
    init_key = jax.random.PRNGKey(cfg.seed)
    params = jax.jit(model.init)(
        init_key, jnp.asarray(batch0["left"]), jnp.asarray(batch0["right"])
    )
    state = create_train_state(step_model, params, num_steps=cfg.num_steps, lr=cfg.lr)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logging.info(f"model {cfg.model_name}: {n_params/1e6:.1f}M params, mesh={mesh.shape}")

    state_sharding = jax.tree_util.tree_map(lambda _: replicate(mesh), state)
    bspec = batch_sharding(mesh)
    batch_shardings = {k: bspec[k] for k in ("left", "right", "disparity", "valid")}

    step_fn = jax.jit(
        make_train_step(step_model),
        in_shardings=(state_sharding, batch_shardings),
        out_shardings=(state_sharding, replicate(mesh)),
        donate_argnums=(0,),
    )

    ckpt = CheckpointManager(f"{cfg.exp_dir}/ckpt")
    restored, restored_step = ckpt.restore(state)
    total_steps = 0
    if restored is not None:
        state, total_steps = restored, restored_step
        logging.info(f"resumed from step {total_steps}")
    state = jax.device_put(state, state_sharding)

    logger = MetricsLogger(cfg.exp_dir)
    limit = max_steps if max_steps is not None else cfg.num_steps
    t_last = time.perf_counter()

    with mesh:
        done = False
        while not done:
            for batch in loader:
                batch = {
                    k: jax.device_put(jnp.asarray(v), batch_shardings[k])
                    for k, v in batch.items()
                }
                state, metrics = step_fn(state, batch)
                total_steps += 1

                if total_steps % 10 == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    now = time.perf_counter()
                    metrics["steps_per_s"] = 10 / (now - t_last)
                    t_last = now
                    logger.push(total_steps, metrics)

                if (
                    total_steps % cfg.save_freq == 0
                    and total_steps > cfg.ckpt_after_steps
                ):
                    ckpt.save(total_steps, jax.device_get(state))

                if total_steps >= limit:
                    done = True
                    break

    ckpt.save(total_steps, jax.device_get(state))
    ckpt.wait()
    logger.flush(total_steps)
    logger.close()
    return state
