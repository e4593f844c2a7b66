"""DynamicStereo: cascaded SST video stereo (no memory), TPU-native.

Re-design of /root/reference/models/core/dynamic_stereo.py: the same
1/16 -> 1/8 -> 1/4 cascade and SST attention as PPMStereo but with no
context net, no pick-and-play memory and no uncertainty — a plain
RAFT-style scanned refinement per scale with 2-D convex upsampling.
Shipped config (models/dynamic_stereo_model.py:27-34):
attention_type="self_stereo_temporal_update_time_update_space",
use_3d_update_block=True, different_update_blocks=True.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.encoder import BasicEncoder
from ppmstereo_tpu.nn.sst import SSTBlock
from ppmstereo_tpu.nn.update import DSSequenceUpdateBlock3D
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.geometry import avg_pool2d, coords_grid_x, interp_bilinear
from ppmstereo_tpu.ops.upsample import convex_upsample_2d


@dataclass(frozen=True)
class DynamicStereoConfig:
    hidden_dim: int = 128
    dim: int = 256
    num_frames: int = 5
    attention_type: str = "self_stereo_temporal_update_time_update_space"
    sst_depth: int = 4
    different_update_blocks: bool = True
    corr_levels: int = 4
    corr_radius: int = 4
    mixed_precision: bool = True

    @property
    def dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32


def _resize_video(x, hw):
    return interp_bilinear(x, hw)


def _upsample_flow_2d(flow, mask):
    b, t, h, w, _ = flow.shape
    up = convex_upsample_2d(
        flow.reshape(b * t, h, w, 2), mask.reshape(b * t, h, w, -1), rate=4
    )
    return up.reshape(b, t, 4 * h, 4 * w, 2)


class DSUpdateLoop(nn.Module):
    """One cascade stage (reference dynamic_stereo.py:291-322)."""

    cfg: DynamicStereoConfig
    iters: int
    interp_scale: int
    collect_preds: bool
    attention_type: str | None = None

    def setup(self):
        self.update_block = DSSequenceUpdateBlock3D(
            hidden_dim=self.cfg.hidden_dim,
            cor_planes=self.cfg.corr_levels * (2 * self.cfg.corr_radius + 1),
            mask_size=4,
            attention_type=self.attention_type,
            dtype=self.cfg.dtype,
        )

    def __call__(self, pyramid, coords0, flow, net, inp):
        cfg = self.cfg
        b, t, h, w, _ = flow.shape
        mask0 = jnp.zeros((b, t, h, w, 9 * 16), cfg.dtype)

        def step(module, carry, _):
            flow, net = carry[0], carry[1]
            coords_x = coords0 + flow[..., 0].reshape(b * t, h, w)
            corrs = corr_lookup(pyramid, coords_x, cfg.corr_radius)
            corrs = corrs.reshape(b, t, h, w, -1).astype(cfg.dtype)

            # inference consumes only the final mask (recomputed from the
            # final net post-scan) — skip the mask head inside the scan
            net, mask, delta = module.update_block(
                net, inp, corrs, flow.astype(cfg.dtype),
                compute_mask=self.collect_preds,
            )
            flow = flow + delta.astype(jnp.float32)
            if not self.collect_preds:
                return (flow, net), None
            carry = (flow, net, mask)

            flow_up = _upsample_flow_2d(flow, mask)
            if self.interp_scale > 1:
                oh = self.interp_scale * flow_up.shape[2]
                ow = self.interp_scale * flow_up.shape[3]
                flow_up = self.interp_scale * _resize_video(flow_up, (oh, ow))
            return carry, flow_up[..., :1]

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.iters,
        )
        if self.collect_preds:
            (flow, net, mask_last), ys = scan(self, (flow, net, mask0), None)
        else:
            (flow, net), ys = scan(self, (flow, net), None)
            mask_last = self.update_block.get_mask(net)
        flow_out = _upsample_flow_2d(flow, mask_last)
        return flow, flow_out, net, ys


class DynamicStereo(nn.Module):
    """Forward over (B, T, H, W, 3) [0,255] clips.

    test_mode=True  -> disparity (B, T, H, W, 1)
    test_mode=False -> predictions (n_total_iters, B, T, H, W, 1)
    """

    cfg: DynamicStereoConfig = DynamicStereoConfig()
    iters: int = 10
    test_mode: bool = False

    def setup(self):
        cfg = self.cfg
        if not cfg.different_update_blocks:
            raise NotImplementedError("shared update blocks not supported")
        self.fnet = BasicEncoder(output_dim=cfg.dim, norm_fn="instance", dtype=cfg.dtype)
        self.sst = SSTBlock(
            dim=cfg.dim, depth=cfg.sst_depth, num_frames=cfg.num_frames,
            attention_type=cfg.attention_type, dtype=cfg.dtype,
        )
        collect = not self.test_mode
        self.loop16 = DSUpdateLoop(
            cfg=cfg, iters=max(self.iters // 2, 1), interp_scale=4,
            collect_preds=collect, attention_type=cfg.attention_type,
            name="update_block16",
        )
        self.loop08 = DSUpdateLoop(
            cfg=cfg, iters=max(self.iters // 2, 1), interp_scale=2,
            collect_preds=collect, name="update_block08",
        )
        self.loop04 = DSUpdateLoop(
            cfg=cfg, iters=self.iters, interp_scale=1,
            collect_preds=collect, name="update_block04",
        )

    def _stage_inputs(self, fmap1, fmap2):
        cfg = self.cfg
        b, t, h, w, _ = fmap1.shape
        pyramid = build_corr_pyramid(
            fmap1.reshape(b * t, h, w, -1),
            fmap2.reshape(b * t, h, w, -1),
            cfg.corr_levels,
        )
        return pyramid, coords_grid_x(b * t, h, w)

    def __call__(self, image1, image2):
        cfg = self.cfg
        b = image1.shape[0]
        image1 = (2.0 * (image1 / 255.0) - 1.0).astype(cfg.dtype)
        image2 = (2.0 * (image2 / 255.0) - 1.0).astype(cfg.dtype)

        both = jnp.concatenate([image1, image2], axis=0)
        fmaps = self.fnet(both)
        fmap1, fmap2 = fmaps[:b], fmaps[b:]

        hdim = cfg.hidden_dim
        net = jnp.tanh(fmap1[..., :hdim])
        inp = nn.relu(fmap1[..., hdim:])

        t = fmap1.shape[1]
        h4, w4 = fmap1.shape[2], fmap1.shape[3]

        f1_16 = avg_pool2d(fmap1, 4, 4)
        f2_16 = avg_pool2d(fmap2, 4, 4)
        f1_16, f2_16 = self.sst(f1_16, f2_16)

        net16 = jnp.tanh(f1_16[..., :hdim])
        inp16 = nn.relu(f1_16[..., hdim:])

        f1_8 = (avg_pool2d(fmap1, 2, 2) + _resize_video(f1_16, (h4 // 2, w4 // 2))) / 2.0
        f2_8 = (avg_pool2d(fmap2, 2, 2) + _resize_video(f2_16, (h4 // 2, w4 // 2))) / 2.0
        net8 = jnp.tanh(f1_8[..., :hdim])
        inp8 = nn.relu(f1_8[..., hdim:])

        all_preds = []

        flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
        pyr, c0 = self._stage_inputs(f1_16, f2_16)
        _, flow_out16, net16, p = self.loop16(pyr, c0, flow16, net16, inp16)
        if p is not None:
            all_preds.append(p)

        h8, w8 = h4 // 2, w4 // 2
        flow8 = -(h8 / flow_out16.shape[2]) * _resize_video(flow_out16, (h8, w8))
        net8 = (net8 + _resize_video(net16, (h8, w8))) / 2.0
        pyr, c0 = self._stage_inputs(f1_8, f2_8)
        _, flow_out8, net8, p = self.loop08(pyr, c0, flow8, net8, inp8)
        if p is not None:
            all_preds.append(p)

        flow4 = -(h4 / flow_out8.shape[2]) * _resize_video(flow_out8, (h4, w4))
        net = (net + _resize_video(net8, (h4, w4))) / 2.0
        pyr, c0 = self._stage_inputs(fmap1, fmap2)
        _, flow_out4, net, p = self.loop04(pyr, c0, flow4, net, inp)
        if p is not None:
            all_preds.append(p)

        if self.test_mode:
            return flow_out4[..., :1]
        return jnp.concatenate(all_preds, axis=0)
