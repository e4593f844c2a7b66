"""RAFT-Stereo: per-pair stereo matching, TPU-native.

The reference wraps the (un-vendored) princeton-vl/RAFT-Stereo submodule
(/root/reference/models/raft_stereo_model.py:17-23, .gitmodules:7-15) as a
per-frame-pair baseline. This is the published architecture (Lipson et
al., 3DV 2021): 1/4-resolution feature encoder, multi-level context
encoder, 1-D all-pairs correlation pyramid, multi-resolution ConvGRU
hierarchy with slow-fast updates, 4x convex upsample.

Doubles as BASELINE.json config #1 (CPU-runnable smoke benchmark).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.encoder import BasicEncoder, ResidualBlock, _make_norm
from ppmstereo_tpu.nn.gru import ConvGRU
from ppmstereo_tpu.nn.motion import BasicMotionEncoder
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.geometry import avg_pool2d, coords_grid_x, interp_bilinear
from ppmstereo_tpu.ops.upsample import convex_upsample_2d


@dataclass(frozen=True)
class RAFTStereoConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    n_gru_layers: int = 3
    mixed_precision: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32


class MultiBasicEncoder(nn.Module):
    """Context encoder with per-scale (1/4, 1/8, 1/16) output heads
    (reference extractor.py:623-736 MultiBasicEncoder)."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out", dtype=self.dtype)(x)
        x = _make_norm(self.norm_fn)(x)
        x = nn.relu(x)
        for planes, stride in ((64, 1), (96, 2), (128, 1)):
            x = ResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype)(x)
            x = ResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype)(x)
        x4 = x
        x8 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(x4)
        x16 = ResidualBlock(128, self.norm_fn, 2, dtype=self.dtype)(x8)

        outs = []
        for scale_x in (x4, x8, x16):
            outs.append(
                Conv(self.output_dim, (3, 3), kernel_init="kaiming_out", dtype=self.dtype)(scale_x)
            )
        return outs  # [1/4, 1/8, 1/16] each output_dim channels


class RAFTStereo(nn.Module):
    """forward: (N, H, W, 3) pairs in [0,255] -> disparity (N, H, W, 1)."""

    cfg: RAFTStereoConfig = RAFTStereoConfig()
    iters: int = 32

    def setup(self):
        cfg = self.cfg
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cfg.dtype)
        self.cnet = MultiBasicEncoder(
            output_dim=cfg.hidden_dim + cfg.context_dim, norm_fn="batch" if False else "instance",
            dtype=cfg.dtype,
        )
        d = cfg.hidden_dim
        self.gru04 = ConvGRU(hidden_dim=d, dtype=cfg.dtype)
        self.gru08 = ConvGRU(hidden_dim=d, dtype=cfg.dtype)
        self.gru16 = ConvGRU(hidden_dim=d, dtype=cfg.dtype)
        self.encoder = BasicMotionEncoder(dtype=cfg.dtype)
        self.flow_conv1 = Conv(256, (3, 3), dtype=cfg.dtype)
        self.flow_conv2 = Conv(2, (3, 3), dtype=cfg.dtype)
        self.mask_conv1 = Conv(256, (3, 3), dtype=cfg.dtype)
        self.mask_conv2 = Conv(16 * 9, (1, 1), padding=(0, 0), dtype=cfg.dtype)

    def __call__(self, image1, image2):
        cfg = self.cfg
        n = image1.shape[0]
        image1 = (2.0 * (image1 / 255.0) - 1.0).astype(cfg.dtype)
        image2 = (2.0 * (image2 / 255.0) - 1.0).astype(cfg.dtype)

        fmaps = self.fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = fmaps[:n], fmaps[n:]
        h4, w4 = fmap1.shape[1], fmap1.shape[2]

        ctx = self.cnet(image1)
        nets = [jnp.tanh(c[..., : cfg.hidden_dim]) for c in ctx]
        inps = [nn.relu(c[..., cfg.hidden_dim :]) for c in ctx]

        pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)
        coords0 = coords_grid_x(n, h4, w4)

        def step(module, carry, _):
            flow, net4, net8, net16 = carry

            # slow-fast GRU hierarchy: coarse levels first
            net16 = module.gru16(
                net16,
                jnp.concatenate([inps[2], avg_pool2d(net8, 2, 2)], axis=-1),
            )
            net8 = module.gru08(
                net8,
                jnp.concatenate(
                    [inps[1], avg_pool2d(net4, 2, 2),
                     interp_bilinear(net16, (net8.shape[1], net8.shape[2]))],
                    axis=-1,
                ),
            )
            corr = corr_lookup(pyramid, coords0 + flow[..., 0], cfg.corr_radius)
            motion = module.encoder(flow.astype(cfg.dtype), corr.astype(cfg.dtype))
            net4 = module.gru04(
                net4,
                jnp.concatenate(
                    [inps[0], motion,
                     interp_bilinear(net8, (net4.shape[1], net4.shape[2]))],
                    axis=-1,
                ),
            )
            delta = self.flow_conv2(nn.relu(self.flow_conv1(net4)))
            # stereo: zero out the y component (RAFT-Stereo convention)
            delta = delta.at[..., 1].set(0.0)
            flow = flow + delta.astype(jnp.float32)
            return (flow, net4, net8, net16), None

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            length=self.iters,
        )
        flow0 = jnp.zeros((n, h4, w4, 2), jnp.float32)
        (flow, net4, *_nets), _ = scan(
            self, (flow0, nets[0], nets[1], nets[2]), None
        )
        # only the final mask is consumed; it is a pure function of the
        # final 1/4-scale GRU state, so compute it once post-scan
        mask_last = 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net4)))

        flow_up = convex_upsample_2d(flow, mask_last, rate=4)
        return flow_up[..., :1]
