"""Model registry + inference wrappers.

Re-design of /root/reference/models/core/model_zoo.py (name -> wrapper
resolution) and the per-model Configurable wrapper shells
(models/*_model.py): each entry builds the core flax model, optionally
restores a checkpoint, and exposes the reference's inference contract

    predictor(batch) -> {"disparity": (N, H, W, 1), "uncertainties": ...}

over a stereo video batch {"stereo_video": (N, 2, H, W, 3) in [0, 255]},
driven by the sliding-window engine. Unlike the reference (which only
registers 2 of its 6 wrappers, model_zoo.py:28-44), every model family is
registered here.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ppmstereo_tpu.models.inference import SlidingWindowPredictor

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def model_zoo(model_name: str, **kwargs):
    """Build a ready-to-run predictor by name (reference model_zoo.py:28-44).

    `fast_mode=True` switches the sliding-window driver to
    non-overlapping windows (~2x throughput, non-parity; see
    SlidingWindowPredictor).
    """
    if model_name not in _REGISTRY:
        raise ValueError(
            f"unknown model {model_name!r}; available: {available_models()}"
        )
    fast_mode = kwargs.pop("fast_mode", False)
    batch_windows = kwargs.pop("batch_windows", 1)
    predictor = _REGISTRY[model_name](**kwargs)
    if fast_mode:
        predictor.predictor.fast_mode = True
    if batch_windows > 1:
        predictor.predictor.batch_windows = batch_windows
    return predictor


def _init_params(model, t, h, w, seed=0):
    zeros = jnp.zeros((1, t, h, w, 3), jnp.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(seed), zeros, zeros)


class StereoVideoPredictor:
    """Wrapper shell: owns params + the sliding-window driver."""

    def __init__(
        self,
        model_ctor: Callable[..., Any],
        kernel_size: int = 20,
        iters: int = 20,
        params=None,
        outputs_uncertainty: bool = False,
        init_hw: tuple[int, int] = (64, 128),
        fast_mode: bool = False,
        batch_windows: int = 1,
        warm_start: bool = False,
        warm_iters: int | None = None,
        wire_f16: bool = False,
        mesh=None,
        encoder_cache: bool = False,
    ):
        self.kernel_size = kernel_size
        self.iters = iters
        self.model = model_ctor()
        self.outputs_uncertainty = outputs_uncertainty
        self.mesh = mesh
        if params is None:
            t0 = min(kernel_size, 4)
            params = _init_params(self.model, t0, *init_hw)
        # normalize to jax arrays (checkpoint restores hand numpy leaves);
        # in mesh mode, replicate params over the mesh so the sharded
        # window jits see consistently-placed captures
        self.params = self._place_params(params)

        def window_fn(left, right):
            out = self.model.apply(self.params, left, right)
            if isinstance(out, tuple):
                return out  # (disparity, uncertainty)
            return out, jnp.zeros_like(out)

        warm_fn = None
        if warm_start:
            # same params, reduced iteration budget, flow_init entry —
            # the model_ctor must accept an iters override (PPM does)
            self.model_warm = model_ctor(warm_iters or iters)

            def warm_fn(left, right, flow_init):
                out = self.model_warm.apply(
                    self.params, left, right, flow_init=flow_init
                )
                if isinstance(out, tuple):
                    return out
                return out, jnp.zeros_like(out)

        enc_fn = body_fn = warm_body_fn = None
        if encoder_cache:
            # parity-free encoder reuse across overlapping windows —
            # requires the model's per-frame encode/body split
            # (PPMStereo.encode_frames)
            def enc_fn(left, right):
                return self.model.apply(
                    self.params, left, right, method="encode_frames"
                )

            def body_fn(left, right, feats):
                out = self.model.apply(self.params, left, right, feats=feats)
                if isinstance(out, tuple):
                    return out
                return out, jnp.zeros_like(out)

            if warm_start:
                def warm_body_fn(left, right, flow_init, feats):
                    out = self.model_warm.apply(
                        self.params, left, right,
                        flow_init=flow_init, feats=feats,
                    )
                    if isinstance(out, tuple):
                        return out
                    return out, jnp.zeros_like(out)

        self.predictor = SlidingWindowPredictor(
            window_fn, kernel_size=kernel_size, fast_mode=fast_mode,
            batch_windows=batch_windows, warm_window_fn=warm_fn,
            wire_dtype=jnp.float16 if wire_f16 else None,
            mesh=mesh,
            encode_window_fn=enc_fn, body_window_fn=body_fn,
            warm_body_window_fn=warm_body_fn,
        )

    def _place_params(self, params):
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, params)
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep), params
        )

    def load_params(self, params):
        self.params = self._place_params(params)
        self.predictor._jitted.clear()

    def __call__(self, batch: dict) -> dict:
        out = self.predictor(batch["stereo_video"])
        if not self.outputs_uncertainty:
            out.pop("uncertainties", None)
        return out


@register("PPMStereoModel")
def _build_ppm(kernel_size: int = 20, iters: int = 20, params=None,
               warm_start: bool = False, warm_iters: int | None = None,
               wire_f16: bool = False, mesh=None, encoder_cache: bool = False,
               **cfg_kwargs):
    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

    cfg = PPMStereoConfig(**cfg_kwargs)
    return StereoVideoPredictor(
        lambda it=None: PPMStereo(cfg=cfg, iters=(it or iters), test_mode=True),
        kernel_size=kernel_size, iters=iters, params=params,
        outputs_uncertainty=True,
        warm_start=warm_start, warm_iters=warm_iters, wire_f16=wire_f16,
        mesh=mesh, encoder_cache=encoder_cache,
    )


@register("PPMStereoVDAModel")
def _build_ppm_vda(kernel_size: int = 20, iters: int = 20, params=None,
                   mesh=None, **cfg_kwargs):
    from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig

    cfg = PPMStereoConfig(use_vfm=True, use_cnet=True, **cfg_kwargs)
    return StereoVideoPredictor(
        lambda: PPMStereo(cfg=cfg, iters=iters, test_mode=True),
        kernel_size=kernel_size, iters=iters, params=params,
        outputs_uncertainty=True, init_hw=(64, 128), mesh=mesh,
    )


@register("DynamicStereoModel")
def _build_dynamic(kernel_size: int = 20, iters: int = 20, params=None,
                   mesh=None, **cfg_kwargs):
    from ppmstereo_tpu.models.dynamic_stereo import DynamicStereo, DynamicStereoConfig

    cfg = DynamicStereoConfig(**cfg_kwargs)
    return StereoVideoPredictor(
        lambda: DynamicStereo(cfg=cfg, iters=iters, test_mode=True),
        kernel_size=kernel_size, iters=iters, params=params, mesh=mesh,
    )


@register("BiDAStereoModel")
def _build_bida(kernel_size: int = 20, iters: int = 10, params=None,
                mesh=None, **cfg_kwargs):
    from ppmstereo_tpu.models.bidastereo import BiDAStereo, BiDAStereoConfig

    cfg = BiDAStereoConfig(**cfg_kwargs)
    return StereoVideoPredictor(
        lambda: BiDAStereo(cfg=cfg, iters=iters, test_mode=True),
        kernel_size=kernel_size, iters=iters, params=params, mesh=mesh,
    )


@register("StereoAnyVideoModel")
def _build_sav(kernel_size: int = 20, iters: int = 12, params=None,
               mesh=None, **cfg_kwargs):
    from ppmstereo_tpu.models.stereoanyvideo import (
        StereoAnyVideo,
        StereoAnyVideoConfig,
    )

    cfg = StereoAnyVideoConfig(**cfg_kwargs)
    return StereoVideoPredictor(
        lambda: StereoAnyVideo(cfg=cfg, iters=iters, test_mode=True),
        kernel_size=kernel_size, iters=iters, params=params,
        init_hw=(64, 128), mesh=mesh,
    )


@register("RAFTStereoModel")
def _build_raft_stereo(kernel_size: int = 20, iters: int = 32, params=None,
                       mesh=None, **cfg_kwargs):
    from ppmstereo_tpu.models.raft_stereo import RAFTStereo, RAFTStereoConfig

    cfg = RAFTStereoConfig(**cfg_kwargs)
    return StereoVideoPredictor(
        lambda: RAFTStereoVideoAdapter(cfg, iters),
        kernel_size=kernel_size, iters=iters, params=params, mesh=mesh,
    )


class RAFTStereoVideoAdapter:
    """Per-frame-pair inference over a clip (reference
    raft_stereo_model.py:61-84): RAFT-Stereo has no temporal model, so the
    clip folds into the batch axis."""

    def __init__(self, cfg, iters):
        from ppmstereo_tpu.models.raft_stereo import RAFTStereo

        self._model = RAFTStereo(cfg=cfg, iters=iters)

    def init(self, rng, left, right):
        b, t, h, w, _ = left.shape
        return self._model.init(
            rng, left.reshape(b * t, h, w, 3), right.reshape(b * t, h, w, 3)
        )

    def apply(self, params, left, right):
        b, t, h, w, _ = left.shape
        disp = self._model.apply(
            params, left.reshape(b * t, h, w, 3), right.reshape(b * t, h, w, 3)
        )
        disp = disp.reshape(b, t, h, w, 1)
        return disp, jnp.zeros_like(disp)
