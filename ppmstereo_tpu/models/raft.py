"""RAFT optical flow, TPU-native — the frozen flow provider for BiDAStereo.

The reference imports RAFT from an (un-vendored) git submodule
(/root/reference/models/raft_model.py:17-19, .gitmodules:1-3) and wraps it
as a frozen module returning 1/4-scale flow (raft_model.py:46-50). This is
the standard published RAFT architecture (Teed & Deng, ECCV 2020):
1/8-resolution feature + context encoders, 4-level all-pairs 2-D
correlation pyramid with r=4 lookup, GRU refinement, 8x convex upsample.

Channels-last; the 2-D correlation volume is one big MXU matmul.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.encoder import _make_norm
from ppmstereo_tpu.nn.norm import InstanceNorm
from ppmstereo_tpu.ops.geometry import interp_bilinear
from ppmstereo_tpu.ops.upsample import convex_upsample_2d


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dtype_str: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: running stats as (non-trainable under the
    frozen-RAFT optimizer partition) parameters."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + self.epsilon)
        return (x - mean) * inv + bias


class RAFTResidualBlock(nn.Module):
    """princeton-vl RAFT residual block: norms inside the block (batch
    norm = frozen running stats for the frozen flow provider), and the
    1x1 downsample path exists ONLY at stride>1 — unlike the reference
    extractor.py block which always projects."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype | None = None

    def _norm(self, name):
        if self.norm_fn == "batch":
            return FrozenBatchNorm(name=name)
        if self.norm_fn == "instance":
            return InstanceNorm()
        return lambda y: y

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, (3, 3), stride=self.stride,
                 kernel_init="kaiming_out", dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm("norm1")(y))
        y = Conv(self.planes, (3, 3), kernel_init="kaiming_out",
                 dtype=self.dtype, name="conv2")(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride > 1:
            x = Conv(self.planes, (1, 1), stride=self.stride, padding=(0, 0),
                     kernel_init="kaiming_out", dtype=self.dtype, name="downsample")(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """1/8-resolution encoder (princeton-vl RAFT BasicEncoder): 7x7 s2
    stem + residual stages (64 s1, 96 s2, 128 s2) + 1x1 output conv.
    Module names mirror the torch state dict for checkpoint import."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), stride=2, kernel_init="kaiming_out",
                 dtype=self.dtype, name="conv1")(x)
        if self.norm_fn == "batch":
            x = FrozenBatchNorm(name="norm1")(x)
        else:
            x = _make_norm(self.norm_fn)(x)
        x = nn.relu(x)
        for li, (planes, stride) in enumerate(((64, 1), (96, 2), (128, 2)), start=1):
            x = RAFTResidualBlock(planes, self.norm_fn, stride, dtype=self.dtype,
                                  name=f"layer{li}_0")(x)
            x = RAFTResidualBlock(planes, self.norm_fn, 1, dtype=self.dtype,
                                  name=f"layer{li}_1")(x)
        return Conv(self.output_dim, (1, 1), padding=(0, 0),
                    kernel_init="kaiming_out", dtype=self.dtype, name="conv2")(x)


def build_corr_pyramid_2d(fmap1, fmap2, num_levels=4):
    """All-pairs 2-D correlation: (B,H,W,C) x (B,H,W,C) ->
    [(B*H*W, H/2^i, W/2^i)] pyramid."""
    b, h, w, c = fmap1.shape
    corr = jnp.einsum(
        "bxc,byc->bxy",
        fmap1.reshape(b, h * w, c),
        fmap2.reshape(b, h * w, c),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        bb, hh, ww, _ = corr.shape
        corr = corr[:, : hh // 2 * 2, : ww // 2 * 2]
        corr = corr.reshape(bb, hh // 2, 2, ww // 2, 2, 1).mean(axis=(2, 4))
        pyramid.append(corr)
    return pyramid


def corr_lookup_2d(pyramid, coords, radius=4):
    """coords: (B, H, W, 2) target positions (x, y). Returns
    (B, H, W, levels*(2r+1)^2)."""
    from ppmstereo_tpu.ops.corr import bilinear_sample_2d

    b, h, w, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # princeton RAFT tap ordering: the x offset varies along the OUTER
    # tap index (meshgrid(dy, dx) stacked last then added to (x, y)) —
    # "ij" indexing reproduces it so imported convc1 weights line up
    dgrid = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)  # (2r+1,2r+1,2)
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2.0**i)
        pos = centroid + dgrid[None]
        sampled = bilinear_sample_2d(corr, pos)  # (BHW, 2r+1, 2r+1, 1)
        out.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)


class RAFTMotionEncoder(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, (1, 1), padding=(0, 0), dtype=self.dtype)(corr))
        cor = nn.relu(Conv(192, (3, 3), dtype=self.dtype)(cor))
        flo = nn.relu(Conv(128, (7, 7), dtype=self.dtype)(flow))
        flo = nn.relu(Conv(64, (3, 3), dtype=self.dtype)(flo))
        out = nn.relu(Conv(126, (3, 3), dtype=self.dtype)(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class RAFTUpdateBlock(nn.Module):
    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    def setup(self):
        from ppmstereo_tpu.nn.gru import SepConvGRU

        self.encoder = RAFTMotionEncoder(dtype=self.dtype)
        self.gru = SepConvGRU(hidden_dim=self.hidden_dim, dtype=self.dtype)
        self.flow_conv1 = Conv(256, (3, 3), dtype=self.dtype)
        self.flow_conv2 = Conv(2, (3, 3), dtype=self.dtype)
        self.mask_conv1 = Conv(256, (3, 3), dtype=self.dtype)
        self.mask_conv2 = Conv(64 * 9, (1, 1), padding=(0, 0), dtype=self.dtype)

    def get_mask(self, net):
        return 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net)))

    def __call__(self, net, inp, corr, flow, compute_mask: bool = True):
        motion = self.encoder(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, x)
        delta = self.flow_conv2(nn.relu(self.flow_conv1(net)))
        mask = self.get_mask(net) if compute_mask else None
        return net, mask, delta


class RAFT(nn.Module):
    """forward(image1, image2): (B, H, W, 3) [0,255] -> flow (B, H, W, 2)."""

    cfg: RAFTConfig = RAFTConfig()
    iters: int = 10

    def setup(self):
        cfg = self.cfg
        self.fnet = RAFTEncoder(256, "instance", dtype=cfg.dtype)
        self.cnet = RAFTEncoder(cfg.hidden_dim + cfg.context_dim, "batch", dtype=cfg.dtype)
        self.update_block = RAFTUpdateBlock(cfg.hidden_dim, dtype=cfg.dtype)

    def __call__(self, image1, image2):
        cfg = self.cfg
        b = image1.shape[0]
        image1 = (2.0 * (image1 / 255.0) - 1.0).astype(cfg.dtype)
        image2 = (2.0 * (image2 / 255.0) - 1.0).astype(cfg.dtype)

        fmaps = self.fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = fmaps[:b], fmaps[b:]
        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., : cfg.hidden_dim])
        inp = nn.relu(cnet[..., cfg.hidden_dim :])

        h8, w8 = fmap1.shape[1], fmap1.shape[2]
        pyramid = build_corr_pyramid_2d(fmap1, fmap2, cfg.corr_levels)

        ys, xs = jnp.meshgrid(
            jnp.arange(h8, dtype=jnp.float32),
            jnp.arange(w8, dtype=jnp.float32),
            indexing="ij",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([xs, ys], axis=-1)[None], (b, h8, w8, 2)
        )

        def step(module, carry, _):
            flow, net = carry
            corr = corr_lookup_2d(pyramid, coords0 + flow, cfg.corr_radius)
            # only the final mask is consumed — recomputed post-scan
            net, _, delta = module.update_block(
                net, inp, corr.astype(cfg.dtype), flow.astype(cfg.dtype),
                compute_mask=False,
            )
            flow = flow + delta.astype(jnp.float32)
            return (flow, net), None

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            length=self.iters,
        )
        flow0 = jnp.zeros((b, h8, w8, 2), jnp.float32)
        (flow, net), _ = scan(self, (flow0, net), None)
        mask_last = self.update_block.get_mask(net)

        # RAFT's convex upsample is rate 8; reuse the rate-parametric op
        flow_up = convex_upsample_2d(flow, mask_last, rate=8)
        return flow, flow_up


class RAFTFlowProvider(nn.Module):
    """The reference RAFTModel wrapper contract (raft_model.py:46-50):
    returns 0.25 * bilinear-resize of the full-res flow to 1/4."""

    cfg: RAFTConfig = RAFTConfig()
    iters: int = 10

    def setup(self):
        self.raft = RAFT(cfg=self.cfg, iters=self.iters)

    def __call__(self, image1, image2):
        _, flow_up = self.raft(image1, image2)
        h, w = flow_up.shape[1] // 4, flow_up.shape[2] // 4
        return 0.25 * interp_bilinear(flow_up, (h, w))
