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
from dataclasses import dataclass

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
    log_freq: int = 100  # running-mean flush interval (reference SUM_FREQ)
    # extra model-config kwargs (e.g. {"use_cnet": False}) — the analog
    # of the reference's architecture-switch flags (train.py:357-485)
    model_kwargs: dict | None = None
    # mesh
    data_parallel: int = 0  # 0 = all devices
    seq_parallel: int = 1
    space_parallel: int = 1
    # ship images to the device as uint8 (cast + normalize on device):
    # 4x less host->device transfer per step. Post-augmentation values
    # are clipped and rounded to [0, 255] — sub-LSB quantization of the
    # photometric jitter, irrelevant to training. Also bounds the host
    # RSS of long runs against per-transfer buffer retention in remote-
    # device clients (observed ~26 MB/step leak on the axon tunnel;
    # uint8 images cut it ~3x).
    wire_uint8: bool = False


def build_train_model(cfg: TrainConfig):
    """Architecture switch (reference train.py:118-154)."""
    name = cfg.model_name
    if name in ("ppmstereo", "memstereo"):
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

        mcfg = PPMStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision,
            **(cfg.model_kwargs or {}),
        )
        return PPMStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), True
    if name == "ppmstereo_vda":
        from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

        mcfg = PPMStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision,
            use_vfm=True, **(cfg.model_kwargs or {}),
        )
        return PPMStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), True
    if name == "dynamicstereo":
        from ppmstereo_tpu.models.dynamic_stereo import (
            DynamicStereo,
            DynamicStereoConfig,
        )

        mcfg = DynamicStereoConfig(
            num_frames=cfg.sample_len, mixed_precision=cfg.mixed_precision,
            **(cfg.model_kwargs or {}),
        )
        return DynamicStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), False
    if name == "bidastereo":
        from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig

        mcfg = BiDAStereoConfig(
            mixed_precision=cfg.mixed_precision, **(cfg.model_kwargs or {})
        )
        return BiDAStereo(cfg=mcfg, iters=cfg.train_iters, test_mode=False), False
    if name == "stereoanyvideo":
        from ppmstereo_tpu.models.stereoanyvideo import (
            StereoAnyVideo,
            StereoAnyVideoConfig,
        )

        mcfg = StereoAnyVideoConfig(
            mixed_precision=cfg.mixed_precision, **(cfg.model_kwargs or {})
        )
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


def build_eval_predictor(cfg: TrainConfig, params, eval_iters: int = 10,
                         kernel_size: int = 10):
    """Test-mode predictor over the CURRENT params for in-training eval
    (reference run_test_eval, train.py:302-321)."""
    from ppmstereo_tpu.models.zoo import StereoVideoPredictor

    name_map = {
        "ppmstereo": "PPMStereoModel",
        "memstereo": "PPMStereoModel",
        "ppmstereo_vda": "PPMStereoVDAModel",
        "dynamicstereo": "DynamicStereoModel",
        "bidastereo": "BiDAStereoModel",
        "stereoanyvideo": "StereoAnyVideoModel",
    }
    from ppmstereo_tpu.models.zoo import _REGISTRY

    build = _REGISTRY[name_map[cfg.model_name]]
    kwargs = dict(mixed_precision=cfg.mixed_precision, **(cfg.model_kwargs or {}))
    if cfg.model_name in ("ppmstereo", "memstereo", "ppmstereo_vda", "dynamicstereo"):
        # the learned time embedding is sized by the training clip length
        kwargs["num_frames"] = cfg.sample_len
    return build(
        kernel_size=kernel_size, iters=eval_iters, params=params, **kwargs
    )


def run_in_training_eval(cfg: TrainConfig, params, step: int, logger,
                         eval_dataset=None):
    from ppmstereo_tpu.evaluation.evaluator import EvalConfig, Evaluator
    from ppmstereo_tpu.evaluation.visualization import colorize_disparity

    if eval_dataset is None:
        from ppmstereo_tpu.data.datasets import SyntheticStereoDataset

        eval_dataset = SyntheticStereoDataset(
            num_seqs=2, sample_len=4, height=cfg.crop_size[0],
            width=cfg.crop_size[1],
        )
    predictor = build_eval_predictor(cfg, params)
    evaluator = Evaluator(EvalConfig(exp_dir=cfg.exp_dir))
    results = evaluator.evaluate_sequence(predictor, eval_dataset)
    evaluator.dump(results, "intrain", step)
    logger.write_dict(step, results["aggregate"], prefix="eval/")
    # disparity image dump (reference train_utils/utils.py:113-177)
    if logger.writer is not None:
        sample = eval_dataset[0]
        out = predictor({"stereo_video": sample["img"][:2]})
        img = colorize_disparity(out["disparity"][0, ..., 0])
        logger.writer.add_image(
            "eval/disparity", img.transpose(2, 0, 1), step
        )
    return results


def train(cfg: TrainConfig, loader=None, max_steps: int | None = None,
          eval_dataset=None, enable_eval: bool = False,
          save_callback=None, init_params=None):
    """Run training; returns the final TrainState. `loader` defaults to
    fetch_dataloader (SceneFlow + DynamicReplica, synthetic fallback).

    save_callback(total_steps, host_state): invoked right after every
    periodic Orbax save with the host-fetched state — the recycle-proof
    export hook (Orbax state lives outside git and dies with the
    container; a callback can export/commit an npz every save_freq
    steps — VERDICT r4 item 4).

    init_params: parameter pytree seeding a FRESH run (used only when no
    Orbax checkpoint exists to resume — e.g. warm-restarting from a
    committed npz export after a container recycle destroyed the Orbax
    state; optimizer state and the LR schedule start over)."""
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
    # crop_size documents the input this mesh shards (the model handles
    # tiny-shard shapes itself — models/ppm_stereo.py::_tiny_row_shards)
    mesh = make_mesh(
        MeshSpec(dp, cfg.seq_parallel, cfg.space_parallel),
        image_hw=tuple(cfg.crop_size),
    )

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
    elif init_params is not None:
        state = state.replace(params=init_params)
        logging.info("seeded params from init_params (fresh optimizer)")
    state = jax.device_put(state, state_sharding)

    logger = MetricsLogger(cfg.exp_dir, sum_freq=cfg.log_freq)
    limit = max_steps if max_steps is not None else cfg.num_steps
    # metric fetches force a device sync; amortize up to the flush
    # interval (cap 50). On a degraded remote tunnel each d2h fetch can
    # stall minutes (observed killing a run's throughput at fetch-every-
    # 10), so fetch as rarely as the logging cadence allows.
    # the logger flushes on steps-since-last-flush (logging_utils), so
    # push_every only bounds the device-sync cadence — no divisibility
    # coupling with log_freq (a divisor-based pick degraded to
    # push_every=1 for prime log_freqs: a d2h fetch EVERY step, minutes
    # of stall each on a degraded tunnel)
    push_every = max(1, min(50, cfg.log_freq))
    t_last = time.perf_counter()

    import gc

    def _wire(k, v):
        v = np.asarray(v)
        if cfg.wire_uint8 and k in ("left", "right"):
            # rint before the cast: astype truncates toward zero, which
            # would bias augmented float images up to 1 LSB downward
            v = np.clip(np.rint(v), 0, 255).astype(np.uint8)
        return v

    done = False
    while not done:
        for batch in loader:
            with mesh:
                # device_put straight from numpy: jnp.asarray first would
                # allocate a second, default-placed device copy per tensor
                batch = {
                    k: jax.device_put(_wire(k, v), batch_shardings[k])
                    for k, v in batch.items()
                }
                state, metrics = step_fn(state, batch)
            total_steps += 1
            if total_steps % 100 == 0:
                gc.collect()  # promptly drop dead host transfer buffers

            if total_steps % push_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.perf_counter()
                metrics["steps_per_s"] = push_every / (now - t_last)
                t_last = now
                logger.push(total_steps, metrics)

            if (
                total_steps % cfg.save_freq == 0
                and total_steps > cfg.ckpt_after_steps
            ):
                host_state = jax.device_get(state)
                ckpt.save(total_steps, host_state)
                if save_callback is not None:
                    save_callback(total_steps, host_state)

            if enable_eval and total_steps % cfg.eval_freq == 0:
                # outside the mesh context: the eval predictor runs
                # single-device jit over the current params
                run_in_training_eval(
                    cfg, jax.device_get(state).params, total_steps,
                    logger, eval_dataset,
                )

            if total_steps >= limit:
                done = True
                break

    ckpt.save(total_steps, jax.device_get(state))
    ckpt.wait()
    logger.flush(total_steps)
    logger.close()
    return state
