"""StereoAnyVideo: video stereo with a frozen monocular-depth prior.

Re-design of /root/reference/models/core/stereoanyvideo.py: frozen
Video-Depth-Anything (ViT-S) features (32ch @ 1/4) concatenated with
96-ch RAFT-style encoder features, ImageNet input normalization, AAPC
correlation with alternating patch shapes -> corr MLP (4*81 -> 128), a
single shared update block across the 1/16 -> 1/8 -> 1/4 cascade, 3-D
convex upsampling. Positive flow scale between stages (no negation,
stereoanyvideo.py:289-312).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Dense
from ppmstereo_tpu.nn.encoder import BasicEncoder
from ppmstereo_tpu.nn.update import SAVSequenceUpdateBlock3D
from ppmstereo_tpu.nn.vda.video_depth import DepthExtractor, imagenet_normalize
from ppmstereo_tpu.ops.corr import aapc_correlation, bilinear_sample_2d
from ppmstereo_tpu.ops.geometry import avg_pool2d, interp_bilinear
from ppmstereo_tpu.ops.upsample import convex_upsample_3d


@dataclass(frozen=True)
class StereoAnyVideoConfig:
    hidden_dim: int = 128
    mixed_precision: bool = False
    encoder: str = "vits"
    # rematerialize each scanned refinement pair on the backward pass
    # (same compile/memory discipline as the PPM loop)
    remat: bool = True

    @property
    def dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32


def _warp_x(right, flow_x):
    """Warp right features by per-pixel x displacement (AAPC pre-warp,
    reference corr.py:190-193 with coords - flow)."""
    b, t, h, w, c = right.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    coords = jnp.stack(
        [xs[None] + flow_x.reshape(b * t, h, w), jnp.broadcast_to(ys, (b * t, h, w))],
        axis=-1,
    )
    out = bilinear_sample_2d(right.reshape(b * t, h, w, c), coords)
    return out.reshape(b, t, h, w, c)


class StereoAnyVideo(nn.Module):
    """forward over (B, T, H, W, 3) [0,255] clips.

    test_mode=True  -> disparity (B, T, H, W, 1)
    test_mode=False -> predictions (n_total_iters, B, T, H, W, 1)
    """

    cfg: StereoAnyVideoConfig = StereoAnyVideoConfig()
    iters: int = 12
    test_mode: bool = False

    def setup(self):
        cfg = self.cfg
        self.cnet = BasicEncoder(output_dim=96, norm_fn="instance", dtype=cfg.dtype)
        self.fnet = BasicEncoder(output_dim=96, norm_fn="instance", dtype=cfg.dtype)
        self.depthnet = DepthExtractor(encoder=cfg.encoder, dtype=cfg.dtype)
        self.corr_mlp_fc1 = Dense(256, dtype=cfg.dtype)
        self.corr_mlp_fc2 = Dense(128, dtype=cfg.dtype)
        self.update_block = SAVSequenceUpdateBlock3D(
            hidden_dim=cfg.hidden_dim, cor_planes=128, mask_size=4, dtype=cfg.dtype
        )

    def corr_mlp(self, x):
        return self.corr_mlp_fc2(nn.gelu(self.corr_mlp_fc1(x), approximate=False))

    def _one_iter(self, left, right, flow, net, inp, psize, compute_mask):
        """One AAPC + update-block refinement iteration.

        The reference zeroes the y flow IN PLACE inside AAPC (corr.py:190)
        every iteration, so the update block always sees y=0 and y deltas
        never accumulate across iterations."""
        cfg = self.cfg
        b, t, h, w, _ = flow.shape
        flow = jnp.concatenate(
            [flow[..., :1], jnp.zeros_like(flow[..., 1:])], axis=-1
        )
        # AAPC uses coords - flow (reference corr.py:192)
        warped = _warp_x(right, -flow[..., 0])
        corrs = aapc_correlation(
            left.reshape(b * t, h, w, -1),
            warped.reshape(b * t, h, w, -1),
            psize,
        ).reshape(b, t, h, w, -1)
        corrs = self.corr_mlp(corrs.astype(cfg.dtype))
        net, mask, delta = self.update_block(
            net, inp, corrs, flow.astype(cfg.dtype), compute_mask=compute_mask
        )
        flow = flow + delta.astype(jnp.float32)
        return flow, net, mask

    def _stage(self, left, right, flow, net, inp, iters, interp_scale, preds):
        """One cascade scale. The psize alternation has period 2
        (reference stereoanyvideo.py:271-329), so the loop is a lifted
        nn.scan over 2-iteration chunks (+ one unrolled tail when iters is
        odd) with per-chunk remat — the same compile-size/HBM discipline
        as the scanned PPM loop, vs the reference's Python unroll."""
        cfg = self.cfg
        b, t, h, w, _ = flow.shape
        collect = not self.test_mode

        def collect_up(flow_out):
            up = flow_out
            if interp_scale > 1:
                oh, ow = interp_scale * up.shape[2], interp_scale * up.shape[3]
                up = interp_scale * interp_bilinear(up, (oh, ow))
            return up[..., :1]

        pairs, tail = divmod(iters, 2)
        mask_last = None
        if pairs:
            if collect:
                def step(module, carry, _):
                    flow, net, _ = carry
                    flow, net, m1 = module._one_iter(
                        left, right, flow, net, inp, (1, 9), True
                    )
                    y1 = collect_up(convex_upsample_3d(flow, m1, rate=4))
                    flow, net, m2 = module._one_iter(
                        left, right, flow, net, inp, (3, 3), True
                    )
                    y2 = collect_up(convex_upsample_3d(flow, m2, rate=4))
                    return (flow, net, m2), jnp.stack([y1, y2])

                body = nn.remat(step, prevent_cse=False) if cfg.remat else step
                scan = nn.scan(
                    body, variable_broadcast="params",
                    split_rngs={"params": False}, length=pairs,
                )
                mask0 = jnp.zeros((b, t, h, w, 27 * 16), cfg.dtype)
                (flow, net, mask_last), ys = scan(self, (flow, net, mask0), None)
                # (pairs, 2, b, t, H, W, 1) -> per-iteration order
                preds.append(ys.reshape(2 * pairs, *ys.shape[2:]))
            else:
                def step(module, carry, _):
                    flow, net = carry
                    flow, net, _ = module._one_iter(
                        left, right, flow, net, inp, (1, 9), False
                    )
                    flow, net, _ = module._one_iter(
                        left, right, flow, net, inp, (3, 3), False
                    )
                    return (flow, net), None

                scan = nn.scan(
                    step, variable_broadcast="params",
                    split_rngs={"params": False}, length=pairs,
                )
                (flow, net), _ = scan(self, (flow, net), None)
        if tail:
            # odd iteration count: one more (1, 9) iteration (index parity
            # restarts even after the pairs)
            flow, net, mask_last = self._one_iter(
                left, right, flow, net, inp, (1, 9), True
            )
            if collect:
                up = collect_up(convex_upsample_3d(flow, mask_last, rate=4))
                preds.append(up[None])
        if mask_last is None:  # test mode, even iters: mask from final net
            mask_last = self.update_block.get_mask(net)
        flow_out = convex_upsample_3d(flow, mask_last, rate=4)
        return flow, flow_out, net

    def __call__(self, image1, image2):
        cfg = self.cfg
        b, t = image1.shape[0], image1.shape[1]

        img1 = imagenet_normalize(image1).astype(cfg.dtype)
        img2 = imagenet_normalize(image2).astype(cfg.dtype)

        d1 = self.depthnet(img1)
        d2 = self.depthnet(img2)
        both = jnp.concatenate([img1, img2], axis=0)
        f_all = self.fnet(both)
        f1, f2 = f_all[:b], f_all[b:]
        c1 = self.cnet(img1)

        fmap1 = jnp.concatenate([d1, f1], axis=-1).astype(jnp.float32)
        fmap2 = jnp.concatenate([d2, f2], axis=-1).astype(jnp.float32)
        context = jnp.concatenate([d1, c1], axis=-1)

        net = jnp.tanh(context)
        inp = nn.relu(context)

        h4, w4 = fmap1.shape[2], fmap1.shape[3]
        s_l, s_r = avg_pool2d(fmap1, 2, 2), avg_pool2d(fmap2, 2, 2)
        ss_l, ss_r = avg_pool2d(fmap1, 4, 4), avg_pool2d(fmap2, 4, 4)
        s_net, s_inp = avg_pool2d(net, 2, 2), avg_pool2d(inp, 2, 2)
        ss_net, ss_inp = avg_pool2d(net, 4, 4), avg_pool2d(inp, 4, 4)

        preds: list = []

        flow16 = jnp.zeros((b, t, h4 // 4, w4 // 4, 2), jnp.float32)
        flow16, flow_out16, ss_net = self._stage(
            ss_l, ss_r, flow16, ss_net, ss_inp, max(self.iters // 2, 1), 4, preds
        )

        h8, w8 = h4 // 2, w4 // 2
        flow8 = (h8 / flow_out16.shape[2]) * interp_bilinear(flow_out16, (h8, w8))
        flow8, flow_out8, s_net = self._stage(
            s_l, s_r, flow8, s_net, s_inp, max(self.iters // 2, 1), 2, preds
        )

        flow4 = (h4 / flow_out8.shape[2]) * interp_bilinear(flow_out8, (h4, w4))
        flow4, flow_out4, net = self._stage(
            fmap1, fmap2, flow4, net, inp, self.iters, 1, preds
        )

        if self.test_mode:
            return flow_out4[..., :1]
        return jnp.concatenate(preds, axis=0)
