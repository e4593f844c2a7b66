"""Sequence update block: the recurrent refinement cell of PPMStereo.

Re-design of /root/reference/models/core/ppmtereo_update.py:880-1003
(SequenceUpdateBlock3D). Multi-entry flax module (setup-style): the PPM
loop calls `get_motion_and_value`, `get_uncertainty` and `__call__` at
different points of each iteration (ppmstereo.py:492-495,569).

All tensors (B, T, H, W, C). The 2-D legacy variant of the reference
(ppmtereo_update.py:1033-1074) is dead code there (signature mismatch at
the call site) and intentionally not carried forward (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import zeros

from ppmstereo_tpu.nn.attention import SpaceAttnBlock, TimeAttnBlock
from ppmstereo_tpu.nn.common import Conv
from ppmstereo_tpu.nn.gru import SepConvGRU3D, SKSepConvGRU3D
from ppmstereo_tpu.nn.motion import BasicMotionEncoder, BasicMotionEncoderV2


class FlowHead(nn.Module):
    """2-layer conv head -> 2-ch delta flow (ppmtereo_update.py:136-144)."""

    hidden_dim: int = 256
    kernel: tuple = (3, 3)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, self.kernel, dtype=self.dtype)(x))
        return Conv(2, self.kernel, dtype=self.dtype)(x)


class Aggregate(nn.Module):
    """Value projection + learned blend scalar for the play step
    (ppmtereo_update.py:634-667): only `to_v` and zero-init `beta` are
    exercised by the PPM loop."""

    dim: int = 128
    dtype: jnp.dtype | None = None

    def setup(self):
        self.to_v = Conv(
            self.dim, (1, 1), padding=(0, 0), use_bias=False, dtype=self.dtype
        )
        self.beta = self.param("beta", zeros, (1,))

    def __call__(self, motion_features):
        return self.to_v(motion_features)


class SequenceUpdateBlock3D(nn.Module):
    """Motion encoder + 3-D separable GRU + flow/uncertainty/mask heads."""

    hidden_dim: int = 128
    cor_planes: int = 36
    mask_size: int = 4
    use_convex_3d: bool = True
    attention_type: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.hidden_dim
        self.encoder = BasicMotionEncoderV2(self.cor_planes, dtype=self.dtype)
        self.gru = SKSepConvGRU3D(hidden_dim=d, dtype=self.dtype)
        self.flow_head = FlowHead(256, (3, 3, 3), dtype=self.dtype)
        self.unc_conv1 = Conv(d, (3, 3), dtype=self.dtype)
        self.unc_conv2 = Conv(1, (1, 1), padding=(0, 0), dtype=self.dtype)
        if self.use_convex_3d:
            self.mask_conv1 = Conv(d + 128, (3, 3, 3), dtype=self.dtype)
            self.mask_conv2 = Conv(
                (self.mask_size**2) * 27, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype
            )
        else:
            self.mask_conv1 = Conv(d + 128, (3, 3), dtype=self.dtype)
            self.mask_conv2 = Conv(
                (self.mask_size**2) * 9, (1, 1), padding=(0, 0), dtype=self.dtype
            )
        if self.attention_type is not None and "update_time" in self.attention_type:
            self.time_attn = TimeAttnBlock(dim=384, num_heads=8, dtype=self.dtype)
        if self.attention_type is not None and "update_space" in self.attention_type:
            self.space_attn = SpaceAttnBlock(dim=384, num_heads=8, dtype=self.dtype)
        self.aggregator = Aggregate(dim=128, dtype=self.dtype)

    def init_motion_hidden_state(self, inp):
        return self.encoder.init_hidden(inp)

    def get_motion_and_value(self, flow, corr, motion_hidden_state):
        """(ppmtereo_update.py:945-950): motion features (128), new hidden
        state (64), value = aggregator.to_v(motion) (128)."""
        motion, hidden = self.encoder(flow, corr, motion_hidden_state)
        value = self.aggregator(motion)
        return motion, hidden, value

    def get_uncertainty(self, net_and_value):
        """Sigmoid conv head on cat[net, value] (ppmtereo_update.py:889-894,
        936-938)."""
        u = nn.relu(self.unc_conv1(net_and_value))
        return nn.sigmoid(self.unc_conv2(u))

    def get_mask(self, net):
        """Convex-upsample mask head on the GRU output. Split out so
        inference can run it once after the scan instead of per
        iteration (only the final mask is consumed in test mode)."""
        return 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net)))

    def __call__(self, net, inp, motion_features, motion_features_global,
                 compute_mask: bool = True):
        """GRU update (ppmtereo_update.py:971-1003).

        net: (B,T,H,W,128); inp/motion/motion_global: (B,T,H,W,128).
        Returns (net, mask(27·ms² or 9·ms²) or None, delta_flow(2)).
        """
        x = jnp.concatenate([inp, motion_features, motion_features_global], axis=-1)
        if self.attention_type is not None and "update_time" in self.attention_type:
            x = self.time_attn(x)
        if self.attention_type is not None and "update_space" in self.attention_type:
            x = self.space_attn(x)

        net = self.gru(net, x)
        delta_flow = self.flow_head(net)
        mask = self.get_mask(net) if compute_mask else None
        return net, mask, delta_flow


class SAVSequenceUpdateBlock3D(nn.Module):
    """StereoAnyVideo's update cell (reference
    /root/reference/models/core/stereoanyvideo_update.py:353-387):
    all-relu BasicMotionEncoder variant (:92-110), SKSepConvGRU3D,
    FlowHead3D, 3-D convex mask head, and unconditional time+space
    attention on the GRU input."""

    hidden_dim: int = 128
    cor_planes: int = 128
    mask_size: int = 4
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.hidden_dim
        self.convc1 = Conv(256, (1, 1), padding=(0, 0), dtype=self.dtype)
        self.convc2 = Conv(192, (3, 3), dtype=self.dtype)
        self.convf1 = Conv(128, (7, 7), dtype=self.dtype)
        self.convf2 = Conv(64, (3, 3), dtype=self.dtype)
        self.conv = Conv(126, (3, 3), dtype=self.dtype)
        self.gru = SKSepConvGRU3D(hidden_dim=d, dtype=self.dtype)
        self.flow_head = FlowHead(256, (3, 3, 3), dtype=self.dtype)
        self.mask_conv1 = Conv(d + 128, (3, 3, 3), dtype=self.dtype)
        self.mask_conv2 = Conv(
            (self.mask_size**2) * 27, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype
        )
        self.time_attn = TimeAttnBlock(dim=256, num_heads=8, dtype=self.dtype)
        self.space_attn = SpaceAttnBlock(dim=256, num_heads=8, dtype=self.dtype)

    def get_mask(self, net):
        """Convex-upsample mask head; split out so inference can run it
        once after the scanned loop (only the final mask is consumed)."""
        return 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net)))

    def __call__(self, net, inp, corrs, flow, compute_mask: bool = True):
        cor = nn.relu(self.convc1(corrs))
        cor = nn.relu(self.convc2(cor))
        flo = nn.relu(self.convf1(flow))
        flo = nn.relu(self.convf2(flo))
        motion = nn.relu(self.conv(jnp.concatenate([cor, flo], axis=-1)))
        motion = jnp.concatenate([motion, flow], axis=-1)

        x = jnp.concatenate([inp, motion], axis=-1)
        x = self.time_attn(x)
        x = self.space_attn(x)

        net = self.gru(net, x)
        delta_flow = self.flow_head(net)
        mask = self.get_mask(net) if compute_mask else None
        return net, mask, delta_flow


class DSSequenceUpdateBlock3D(nn.Module):
    """DynamicStereo's update cell (reference
    /root/reference/models/core/update.py:481-525): BasicMotionEncoder +
    plain SepConvGRU3D + FlowHead3D + 2-D convex-upsample mask head,
    with optional time/space attention on the GRU input at 1/16."""

    hidden_dim: int = 128
    cor_planes: int = 36
    mask_size: int = 4
    attention_type: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.hidden_dim
        # DS's motion encoder applies ReLU (not the PPM GELU) on convc1
        # (reference update.py:227)
        self.encoder = BasicMotionEncoder(dtype=self.dtype, corr_act="relu")
        self.gru = SepConvGRU3D(hidden_dim=d, dtype=self.dtype)
        self.flow_head = FlowHead(256, (3, 3, 3), dtype=self.dtype)
        self.mask_conv1 = Conv(d + 128, (3, 3), dtype=self.dtype)
        self.mask_conv2 = Conv(
            (self.mask_size**2) * 9, (1, 1), padding=(0, 0), dtype=self.dtype
        )
        if self.attention_type is not None and "update_time" in self.attention_type:
            self.time_attn = TimeAttnBlock(dim=256, num_heads=8, dtype=self.dtype)
        if self.attention_type is not None and "update_space" in self.attention_type:
            self.space_attn = SpaceAttnBlock(dim=256, num_heads=8, dtype=self.dtype)

    def get_mask(self, net):
        """Convex-upsample mask head; see SequenceUpdateBlock3D.get_mask."""
        return 0.25 * self.mask_conv2(nn.relu(self.mask_conv1(net)))

    def __call__(self, net, inp, corrs, flow, compute_mask: bool = True):
        """All inputs (B, T, H, W, C). Returns (net, mask(9·ms²) or None, delta)."""
        motion = self.encoder(flow, corrs)
        x = jnp.concatenate([inp, motion], axis=-1)
        if self.attention_type is not None and "update_time" in self.attention_type:
            x = self.time_attn(x)
        if self.attention_type is not None and "update_space" in self.attention_type:
            x = self.space_attn(x)

        net = self.gru(net, x)
        delta_flow = self.flow_head(net)
        mask = self.get_mask(net) if compute_mask else None
        return net, mask, delta_flow
