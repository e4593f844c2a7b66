"""RAFT-Stereo: per-pair stereo matching, TPU-native.

The reference wraps the (un-vendored) princeton-vl/RAFT-Stereo submodule
(/root/reference/models/raft_stereo_model.py:17-23, .gitmodules:7-15) as a
per-frame-pair baseline with the shipped args (raft_stereo_model.py:34-45):
hidden_dims [128]x3, corr 'reg' (levels 4, radius 4), n_downsample=2,
n_gru_layers=3, slow_fast_gru=False, context_norm='batch'. This module
implements that architecture faithfully (Lipson et al., 3DV 2021) with
torch-mirroring module names so real raftstereo-*.pth checkpoints import
through utils/zoo_mappings.raftstereo_mapping:

  * 1/4-res feature encoder (stride-1 stem, stride-2 layers 2 and 3,
    instance norm);
  * multi-scale context encoder (same trunk + layers 4/5, frozen batch
    norm, per-scale [hidden, context] output heads);
  * per-scale context->(cz, cr, cq) gate biases added inside the ConvGRUs;
  * 1-D all-pairs correlation pyramid, 9-tap lookup;
  * 3-level ConvGRU hierarchy updated coarse->fine every iteration;
  * rate-4 convex upsample. The refinement loop is a lifted nn.scan.

Doubles as BASELINE.json config #1 (CPU-runnable smoke benchmark).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.models.raft import FrozenBatchNorm, RAFTResidualBlock
from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.norm import InstanceNorm
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.geometry import coords_grid_x, interp_bilinear
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


def _pool2x(x):
    """torch F.avg_pool2d(x, 3, stride=2, padding=1) with
    count_include_pad=True (RAFT-Stereo core/update.py pool2x)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / 9.0


class RSEncoder(nn.Module):
    """princeton RAFT-Stereo BasicEncoder at n_downsample=2: stride-1
    7x7 stem, layer strides (1, 2, 2) -> 1/4. Torch-mirroring names."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=1, kernel_init="kaiming_out",
                 dtype=self.dtype, name="conv1")(x)
        if self.norm_fn == "batch":
            x = FrozenBatchNorm(name="norm1")(x)
        elif self.norm_fn == "instance":
            x = InstanceNorm()(x)
        x = nn.relu(x)
        for li, (planes, stride) in enumerate(((64, 1), (96, 2), (128, 2)), start=1):
            x = RAFTResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype,
                                  name=f"layer{li}_0")(x)
            x = RAFTResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype,
                                  name=f"layer{li}_1")(x)
        return Conv(self.output_dim, (1, 1), padding=(0, 0),
                    kernel_init="kaiming_out", dtype=self.dtype, name="conv2")(x)


class RSMultiEncoder(nn.Module):
    """princeton RAFT-Stereo MultiBasicEncoder at n_downsample=2: the
    RSEncoder trunk + stride-2 layers 4/5 and per-scale [hidden, context]
    heads. Head names keep the torch 08/16/32 labels (which mean 1/4,
    1/8, 1/16 at this downsample)."""

    hidden_dim: int = 128
    context_dim: int = 128
    norm_fn: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=1, kernel_init="kaiming_out",
                 dtype=self.dtype, name="conv1")(x)
        if self.norm_fn == "batch":
            x = FrozenBatchNorm(name="norm1")(x)
        elif self.norm_fn == "instance":
            x = InstanceNorm()(x)
        x = nn.relu(x)
        for li, (planes, stride) in enumerate(((64, 1), (96, 2), (128, 2)), start=1):
            x = RAFTResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype,
                                  name=f"layer{li}_0")(x)
            x = RAFTResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype,
                                  name=f"layer{li}_1")(x)
        x04 = x
        x08 = RAFTResidualBlock(128, self.norm_fn, 2, dtype=self.dtype,
                                name="layer4_0")(x04)
        x08 = RAFTResidualBlock(128, self.norm_fn, 1, dtype=self.dtype,
                                name="layer4_1")(x08)
        x16 = RAFTResidualBlock(128, self.norm_fn, 2, dtype=self.dtype,
                                name="layer5_0")(x08)
        x16 = RAFTResidualBlock(128, self.norm_fn, 1, dtype=self.dtype,
                                name="layer5_1")(x16)

        dims = (self.hidden_dim, self.context_dim)
        out04 = tuple(
            Conv(d, (3, 3), kernel_init="kaiming_out", dtype=self.dtype,
                 name=f"outputs08_{i}_conv")(
                RAFTResidualBlock(128, self.norm_fn, 1, dtype=self.dtype,
                                  name=f"outputs08_{i}_res")(x04))
            for i, d in enumerate(dims)
        )
        out08 = tuple(
            Conv(d, (3, 3), kernel_init="kaiming_out", dtype=self.dtype,
                 name=f"outputs16_{i}_conv")(
                RAFTResidualBlock(128, self.norm_fn, 1, dtype=self.dtype,
                                  name=f"outputs16_{i}_res")(x08))
            for i, d in enumerate(dims)
        )
        out16 = tuple(
            Conv(d, (3, 3), kernel_init="kaiming_out", dtype=self.dtype,
                 name=f"outputs32_{i}_conv")(x16)
            for i, d in enumerate(dims)
        )
        return (out04, out08, out16)  # finest -> coarsest


class RSContextGRU(nn.Module):
    """RAFT-Stereo ConvGRU: gate convs on cat[h, x] with per-gate context
    biases added BEFORE the nonlinearity (core/update.py ConvGRU)."""

    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        d = self.hidden_dim
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(d, (3, 3), dtype=self.dtype, name="convz")(hx) + cz)
        r = nn.sigmoid(Conv(d, (3, 3), dtype=self.dtype, name="convr")(hx) + cr)
        q = jnp.tanh(
            Conv(d, (3, 3), dtype=self.dtype, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            ) + cq
        )
        return (1 - z) * h + z * q


class RSMotionEncoder(nn.Module):
    """RAFT-Stereo BasicMotionEncoder: 64-ch variant (core/update.py)."""

    cor_planes: int = 36
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(64, (1, 1), padding=(0, 0), dtype=self.dtype, name="convc1")(corr))
        cor = nn.relu(Conv(64, (3, 3), dtype=self.dtype, name="convc2")(cor))
        flo = nn.relu(Conv(64, (7, 7), dtype=self.dtype, name="convf1")(flow))
        flo = nn.relu(Conv(64, (3, 3), dtype=self.dtype, name="convf2")(flo))
        out = nn.relu(Conv(126, (3, 3), dtype=self.dtype, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class RSUpdateBlock(nn.Module):
    """BasicMultiUpdateBlock at n_gru_layers=3, slow_fast_gru=False:
    every iteration updates 1/16 -> 1/8 -> 1/4 (core/update.py)."""

    hidden_dim: int = 128
    cor_planes: int = 36
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.hidden_dim
        self.encoder = RSMotionEncoder(self.cor_planes, dtype=self.dtype)
        self.gru04 = RSContextGRU(d, dtype=self.dtype)
        self.gru08 = RSContextGRU(d, dtype=self.dtype)
        self.gru16 = RSContextGRU(d, dtype=self.dtype)
        self.flow_conv1 = Conv(256, (3, 3), dtype=self.dtype)
        self.flow_conv2 = Conv(2, (3, 3), dtype=self.dtype)
        self.mask_conv1 = Conv(256, (3, 3), dtype=self.dtype)
        self.mask_conv2 = Conv(16 * 9, (1, 1), padding=(0, 0), dtype=self.dtype)

    def get_mask(self, net04):
        return 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net04)))

    def __call__(self, nets, ctx_gates, corr, flow, compute_mask=True):
        net04, net08, net16 = nets
        g04, g08, g16 = ctx_gates  # each (cz, cr, cq)

        net16 = self.gru16(net16, *g16, _pool2x(net08))
        net08 = self.gru08(
            net08, *g08, _pool2x(net04),
            interp_bilinear(net16, (net08.shape[1], net08.shape[2])),
        )
        motion = self.encoder(flow, corr)
        net04 = self.gru04(
            net04, *g04, motion,
            interp_bilinear(net08, (net04.shape[1], net04.shape[2])),
        )
        delta = self.flow_conv2(nn.relu(self.flow_conv1(net04)))
        mask = self.get_mask(net04) if compute_mask else None
        return (net04, net08, net16), mask, delta


class RAFTStereo(nn.Module):
    """forward: (N, H, W, 3) pairs in [0,255] -> disparity (N, H, W, 1)."""

    cfg: RAFTStereoConfig = RAFTStereoConfig()
    iters: int = 32

    def setup(self):
        cfg = self.cfg
        self.fnet = RSEncoder(output_dim=256, norm_fn="instance", dtype=cfg.dtype)
        self.cnet = RSMultiEncoder(
            hidden_dim=cfg.hidden_dim, context_dim=cfg.context_dim,
            norm_fn="batch", dtype=cfg.dtype,
        )
        self.update_block = RSUpdateBlock(
            hidden_dim=cfg.hidden_dim,
            cor_planes=cfg.corr_levels * (2 * cfg.corr_radius + 1),
            dtype=cfg.dtype,
        )
        # per-scale context -> (cz|cr|cq) gate biases (raft_stereo.py
        # context_zqr_convs)
        self.context_zqr_convs = [
            Conv(cfg.hidden_dim * 3, (3, 3), dtype=cfg.dtype,
                 name=f"context_zqr_convs_{i}")
            for i in range(cfg.n_gru_layers)
        ]

    def __call__(self, image1, image2):
        cfg = self.cfg
        n = image1.shape[0]
        image1 = (2.0 * (image1 / 255.0) - 1.0).astype(cfg.dtype)
        image2 = (2.0 * (image2 / 255.0) - 1.0).astype(cfg.dtype)

        fmaps = self.fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = fmaps[:n].astype(jnp.float32), fmaps[n:].astype(jnp.float32)
        h4, w4 = fmap1.shape[1], fmap1.shape[2]

        ctx = self.cnet(image1)  # ((h, c) per scale, finest first)
        nets = tuple(jnp.tanh(h) for h, _ in ctx)
        gates = tuple(
            tuple(jnp.split(conv(nn.relu(c)), 3, axis=-1))
            for (_, c), conv in zip(ctx, self.context_zqr_convs)
        )

        pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)
        coords0 = coords_grid_x(n, h4, w4)

        def step(module, carry, _):
            flow, nets = carry
            corr = corr_lookup(pyramid, coords0 + flow[..., 0], cfg.corr_radius)
            corr = corr.reshape(n, h4, w4, -1)
            nets, _, delta = module.update_block(
                nets, gates, corr.astype(cfg.dtype), flow.astype(cfg.dtype),
                compute_mask=False,
            )
            # stereo: the y component of the update is zeroed
            # (raft_stereo.py delta_flow[:, 1] = 0)
            delta = jnp.concatenate(
                [delta[..., :1], jnp.zeros_like(delta[..., 1:])], axis=-1
            )
            flow = flow + delta.astype(jnp.float32)
            return (flow, nets), None

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            length=self.iters,
        )
        flow0 = jnp.zeros((n, h4, w4, 2), jnp.float32)
        (flow, nets), _ = scan(self, (flow0, nets), None)
        # only the final mask is consumed: a pure function of the final
        # 1/4 GRU state, computed once post-scan
        mask_last = self.update_block.get_mask(nets[0])

        flow_up = convex_upsample_2d(flow, mask_last, rate=4)
        return flow_up[..., :1]
