"""BiDAStereo: bidirectional-alignment video stereo, TPU-native.

Re-design of /root/reference/models/core/bidastereo.py and
bidastereo_update.py: frozen RAFT optical flow between consecutive right
frames, forward/backward feature warping, triple-frame correlation (TFCL)
with alternating patch shapes per iteration, a bidirectional flow-warped
48-ch motion hidden state, and a single shared SKSepConvGRU3D update block
across the 1/16 -> 1/8 -> 1/4 cascade (no SST, no negation between
stages — BiDA carries positive flow scale, bidastereo.py:301-325).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.models.raft import RAFTConfig, RAFTFlowProvider
from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.encoder import BasicEncoder
from ppmstereo_tpu.nn.gru import SKSepConvGRU3D
from ppmstereo_tpu.nn.update import FlowHead
from ppmstereo_tpu.ops.corr import bilinear_sample_2d, tfcl_correlation
from ppmstereo_tpu.ops.geometry import avg_pool2d, interp_bilinear
from ppmstereo_tpu.ops.upsample import convex_upsample_2d


@dataclass(frozen=True)
class BiDAStereoConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    mixed_precision: bool = False
    raft_iters: int = 10

    @property
    def dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32


def flow_warp(x, flow):
    """Warp (N, H, W, C) by flow (N, H, W, 2) — bilinear, zero padding,
    align_corners (reference bidastereo.py:160-183)."""
    n, h, w, _ = x.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], axis=-1)[None]
    return bilinear_sample_2d(x, grid + flow)


class MultiMotionEncoder(nn.Module):
    """Bidirectional flow-warped motion hidden state encoder
    (reference bidastereo_update.py:85-157)."""

    cor_planes: int = 27
    dtype: jnp.dtype | None = None

    def setup(self):
        self.convc1 = Conv(96, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.convc2 = Conv(192, (3, 3), dtype=self.dtype)
        self.convf1 = Conv(128, (7, 7), dtype=self.dtype)
        self.convf2 = Conv(64, (3, 3), dtype=self.dtype)
        self.final_conv = Conv(126 + 48, (3, 3), dtype=self.dtype)
        self.init_hidden_state = self.param(
            "init_hidden_state", nn.initializers.normal(1.0), (1, 1, 1, 1, 48)
        )

    def init_hidden(self, b, t, h, w):
        return jnp.broadcast_to(
            self.init_hidden_state.astype(self.dtype or jnp.float32),
            (b, t, h, w, 48),
        )

    def __call__(self, motion_hidden_state, flow_fw, flow_bw, flow, corr):
        """motion_hidden_state: (B,T,H,W,48); flow_fw/bw: (B,T-1,H,W,2);
        flow: (B,T,H,W,2); corr: (B,T,H,W,27)."""
        b, t, h, w, _ = motion_hidden_state.shape

        bw = flow_warp(
            motion_hidden_state[:, 1:].reshape(b * (t - 1), h, w, 48),
            flow_bw.reshape(b * (t - 1), h, w, 2),
        ).reshape(b, t - 1, h, w, 48)
        bw = jnp.concatenate([bw, motion_hidden_state[:, -1:]], axis=1)

        fw = flow_warp(
            motion_hidden_state[:, : t - 1].reshape(b * (t - 1), h, w, 48),
            flow_fw.reshape(b * (t - 1), h, w, 2),
        ).reshape(b, t - 1, h, w, 48)
        fw = jnp.concatenate([motion_hidden_state[:, :1], fw], axis=1)

        p = self.cor_planes // 3
        cor = jnp.concatenate(
            [self.convc1(corr[..., i * p : (i + 1) * p]) for i in range(3)], axis=-1
        )
        cor = nn.gelu(cor, approximate=False)
        cor = nn.relu(self.convc2(cor))
        flo = nn.relu(self.convf1(flow))
        flo = nn.relu(self.convf2(flo))

        cat = jnp.concatenate([cor, flo, fw, bw, motion_hidden_state], axis=-1)
        out = nn.relu(self.final_conv(cat))
        motion, hidden = out[..., :126], out[..., 126:]
        return jnp.concatenate([motion, flow], axis=-1), hidden


class MultiSequenceUpdateBlock3D(nn.Module):
    """(reference bidastereo_update.py:160-188)."""

    hidden_dim: int = 128
    cor_planes: int = 27
    mask_size: int = 4
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.hidden_dim
        self.encoder = MultiMotionEncoder(self.cor_planes, dtype=self.dtype)
        self.gru = SKSepConvGRU3D(hidden_dim=d, dtype=self.dtype)
        self.flow_head = FlowHead(256, (3, 3, 3), dtype=self.dtype)
        self.mask_conv1 = Conv(d + 128, (3, 3), dtype=self.dtype)
        self.mask_conv2 = Conv(
            (self.mask_size**2) * 9, (1, 1), padding=(0, 0), dtype=self.dtype
        )

    def __call__(self, net, inp, corrs, flow, motion_hidden_state, flow_fw, flow_bw):
        motion, motion_hidden_state = self.encoder(
            motion_hidden_state, flow_fw, flow_bw, flow, corrs
        )
        x = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, x)
        delta = self.flow_head(net)
        mask = 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net)))
        return net, mask, delta, motion_hidden_state


def _upsample_flow_2d(flow, mask):
    b, t, h, w, _ = flow.shape
    up = convex_upsample_2d(
        flow.reshape(b * t, h, w, 2), mask.reshape(b * t, h, w, -1), rate=4
    )
    return up.reshape(b, t, 4 * h, 4 * w, 2)


class BiDAStereo(nn.Module):
    """forward over (B, T, H, W, 3) [0,255] clips.

    test_mode=True  -> disparity (B, T, H, W, 1)
    test_mode=False -> predictions (n_total_iters, B, T, H, W, 1)
    """

    cfg: BiDAStereoConfig = BiDAStereoConfig()
    iters: int = 10
    test_mode: bool = False

    def setup(self):
        cfg = self.cfg
        self.raft = RAFTFlowProvider(
            cfg=RAFTConfig(), iters=cfg.raft_iters, name="raft"
        )
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cfg.dtype)
        self.update_block = MultiSequenceUpdateBlock3D(
            hidden_dim=cfg.hidden_dim, cor_planes=27, mask_size=4, dtype=cfg.dtype
        )

    def _compute_flows(self, seq2):
        """Frozen RAFT flow between consecutive right frames
        (reference bidastereo.py:145-158): fw[i] warps frame i+1's content
        to i... (kept with reference's orientation)."""
        b, t, h, w, _ = seq2.shape
        prev = seq2[:, :-1].reshape(b * (t - 1), h, w, 3)
        nxt = seq2[:, 1:].reshape(b * (t - 1), h, w, 3)
        # backward: seq[i+1] -> seq[i]; forward: seq[i] -> seq[i+1]
        flow_bw = self.raft(prev, nxt)
        flow_fw = self.raft(nxt, prev)
        flow_bw = jax.lax.stop_gradient(flow_bw)
        flow_fw = jax.lax.stop_gradient(flow_fw)
        h4, w4 = flow_bw.shape[1], flow_bw.shape[2]
        return (
            flow_fw.reshape(b, t - 1, h4, w4, 2),
            flow_bw.reshape(b, t - 1, h4, w4, 2),
        )

    def _stage(self, corr_left, corr_rights, flow, net, inp, mhs, flow_fw, flow_bw,
               iters, interp_scale, preds):
        """One cascade scale: alternating-patch TFCL + shared update block."""
        cfg = self.cfg
        b, t, h, w, _ = flow.shape
        collect = not self.test_mode
        flow_out = None
        for itr in range(iters):
            small_patch = itr % 2 == 1
            psize = (3, 3) if small_patch else (1, 9)

            # the reference zeroes the y flow IN PLACE inside TFCL
            # (corr.py:125) every iteration, so the update block always
            # sees y=0 and y deltas never accumulate across iterations
            flow = jnp.concatenate(
                [flow[..., :1], jnp.zeros_like(flow[..., 1:])], axis=-1
            )
            coords_flow = flow
            warped = [
                flow_warp(
                    cr.reshape(b * t, h, w, -1),
                    coords_flow.reshape(b * t, h, w, 2),
                ).reshape(b, t, h, w, -1)
                for cr in corr_rights
            ]
            corrs = tfcl_correlation(
                corr_left.reshape(b * t, h, w, -1),
                [wp.reshape(b * t, h, w, -1) for wp in warped],
                psize,
            ).reshape(b, t, h, w, -1).astype(cfg.dtype)

            net, mask, delta, mhs = self.update_block(
                net, inp, corrs, flow.astype(cfg.dtype), mhs, flow_fw, flow_bw
            )
            flow = flow + delta.astype(jnp.float32)
            flow_out = _upsample_flow_2d(flow, mask)
            if collect:
                up = flow_out
                if interp_scale > 1:
                    oh, ow = interp_scale * up.shape[2], interp_scale * up.shape[3]
                    up = interp_scale * interp_bilinear(up, (oh, ow))
                preds.append(up[..., :1])
        return flow, flow_out, net, mhs

    def __call__(self, seq1, seq2, flows=None):
        """flows: optional precomputed ((B,T-1,H/4,W/4,2) fw, bw) pair
        replacing the frozen RAFT (the reference's compute_flow,
        bidastereo.py:145-158) — used by tests and by callers that batch
        flow computation separately."""
        cfg = self.cfg
        b, t = seq1.shape[0], seq1.shape[1]

        if flows is None:
            flow_fw4, flow_bw4 = self._compute_flows(seq2)
        else:
            flow_fw4, flow_bw4 = flows

        seq1n = (2.0 * (seq1 / 255.0) - 1.0).astype(cfg.dtype)
        seq2n = (2.0 * (seq2 / 255.0) - 1.0).astype(cfg.dtype)

        fmaps = self.fnet(jnp.concatenate([seq1n, seq2n], axis=0))
        fmap1, fmap2 = fmaps[:b].astype(jnp.float32), fmaps[b:].astype(jnp.float32)
        h4, w4 = fmap1.shape[2], fmap1.shape[3]

        def scale_flow(f, s):
            # both the 1/8 and 1/16 flows are resized straight from the
            # 1/4-res flow (reference bidastereo.py:195-210), NOT by
            # composing two halvings
            h, w = f.shape[2] // s, f.shape[3] // s
            return (1.0 / s) * interp_bilinear(f, (h, w))

        flow_fw8, flow_bw8 = scale_flow(flow_fw4, 2), scale_flow(flow_bw4, 2)
        flow_fw16, flow_bw16 = scale_flow(flow_fw4, 4), scale_flow(flow_bw4, 4)

        # warp right features fw/bw along RAFT flows (reference :226-241)
        def shift_warp(fm, flows, direction):
            inner = (
                fm[:, 1:] if direction == "bw" else fm[:, : t - 1]
            ).reshape(b * (t - 1), h4, w4, -1)
            warped = flow_warp(
                inner, flows.reshape(b * (t - 1), h4, w4, 2)
            ).reshape(b, t - 1, h4, w4, -1)
            if direction == "bw":
                return jnp.concatenate([warped, fm[:, -1:]], axis=1)
            return jnp.concatenate([fm[:, :1], warped], axis=1)

        right_bw = shift_warp(fmap2, flow_bw4, "bw")
        right_fw = shift_warp(fmap2, flow_fw4, "fw")
        corr_rights4 = (fmap2, right_fw, right_bw)

        net = jnp.tanh(fmap1[..., : cfg.hidden_dim]).astype(cfg.dtype)
        inp = nn.relu(fmap1[..., cfg.hidden_dim :]).astype(cfg.dtype)

        left8 = avg_pool2d(fmap1, 2, 2)
        rights8 = tuple(avg_pool2d(x, 2, 2) for x in corr_rights4)
        net8 = avg_pool2d(net, 2, 2)
        inp8 = avg_pool2d(inp, 2, 2)
        left16 = avg_pool2d(fmap1, 4, 4)
        rights16 = tuple(avg_pool2d(x, 4, 4) for x in corr_rights4)
        net16 = avg_pool2d(net, 4, 4)
        inp16 = avg_pool2d(inp, 4, 4)

        preds: list = []

        # 1/16
        flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
        mhs16 = self.update_block.encoder.init_hidden(b, t, h4 // 4, w4 // 4)
        flow16, flow_out16, net16, mhs16 = self._stage(
            left16, rights16, flow16, net16, inp16, mhs16, flow_fw16, flow_bw16,
            max(self.iters // 2, 1), 4, preds,
        )

        # 1/8 (positive scale — no negation, reference :301-302)
        h8, w8 = h4 // 2, w4 // 2
        flow8 = (h8 / flow_out16.shape[2]) * interp_bilinear(flow_out16, (h8, w8))
        mhs8 = interp_bilinear(mhs16, (h8, w8))
        flow8, flow_out8, net8, mhs8 = self._stage(
            left8, rights8, flow8, net8, inp8, mhs8, flow_fw8, flow_bw8,
            max(self.iters // 2, 1), 2, preds,
        )

        # 1/4
        flow4 = (h4 / flow_out8.shape[2]) * interp_bilinear(flow_out8, (h4, w4))
        mhs4 = interp_bilinear(mhs8, (h4, w4))
        flow4, flow_out4, net, mhs4 = self._stage(
            fmap1, corr_rights4, flow4, net, inp, mhs4, flow_fw4, flow_bw4,
            self.iters, 1, preds,
        )

        if self.test_mode:
            return flow_out4[..., :1]
        return jnp.stack(preds, axis=0)
