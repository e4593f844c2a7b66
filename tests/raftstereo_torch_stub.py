"""Faithful torch implementation of princeton-vl RAFT-Stereo at the
reference's shipped args (/root/reference/models/raft_stereo_model.py:34-45:
hidden_dims [128]x3, corr 'reg' levels 4 radius 4, n_downsample=2,
n_gru_layers=3, slow_fast_gru=False, context_norm='batch').

The reference consumes RAFT-Stereo through an un-vendored git submodule
(.gitmodules:7-15), absent from this environment; this stub re-implements
the published architecture (Lipson et al., 3DV 2021) with the official
state-dict layout (fnet/cnet/update_block/context_zqr_convs) so the
import mapping and the TPU-native models/raft_stereo.py can be
parity-tested, and real raftstereo-*.pth checkpoints import through the
same path. Test-only file.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.raft_torch_stub import ResidualBlock


class BasicEncoder(nn.Module):
    """RAFT-Stereo feature encoder, downsample=2 -> 1/4."""

    def __init__(self, output_dim=256, norm_fn="instance", downsample=2):
        super().__init__()
        self.norm_fn = norm_fn
        if norm_fn == "batch":
            self.norm1 = nn.BatchNorm2d(64)
        elif norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(64)
        else:
            self.norm1 = nn.Sequential()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=1 + (downsample > 2), padding=3)
        self.relu1 = nn.ReLU(inplace=True)
        self.in_planes = 64
        self.layer1 = self._make_layer(64, stride=1)
        self.layer2 = self._make_layer(96, stride=1 + (downsample > 1))
        self.layer3 = self._make_layer(128, stride=1 + (downsample > 0))
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def _make_layer(self, dim, stride=1):
        layers = (
            ResidualBlock(self.in_planes, dim, self.norm_fn, stride=stride),
            ResidualBlock(dim, dim, self.norm_fn, stride=1),
        )
        self.in_planes = dim
        return nn.Sequential(*layers)

    def forward(self, x):
        is_list = isinstance(x, (tuple, list))
        if is_list:
            x = torch.cat(x, dim=0)
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.conv2(x)
        if is_list:
            x = torch.split(x, x.shape[0] // 2, dim=0)
        return x


class MultiBasicEncoder(nn.Module):
    """RAFT-Stereo context encoder, downsample=2: trunk to 1/4, layers
    4/5 to 1/8 and 1/16, per-scale [hidden, context] heads (official
    naming keeps 08/16/32 labels from the downsample=3 case)."""

    def __init__(self, output_dim=((128,) * 3, (128,) * 3), norm_fn="batch",
                 downsample=2):
        super().__init__()
        self.norm_fn = norm_fn
        if norm_fn == "batch":
            self.norm1 = nn.BatchNorm2d(64)
        elif norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(64)
        else:
            self.norm1 = nn.Sequential()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=1 + (downsample > 2), padding=3)
        self.relu1 = nn.ReLU(inplace=True)
        self.in_planes = 64
        self.layer1 = self._make_layer(64, stride=1)
        self.layer2 = self._make_layer(96, stride=1 + (downsample > 1))
        self.layer3 = self._make_layer(128, stride=1 + (downsample > 0))
        self.layer4 = self._make_layer(128, stride=2)
        self.layer5 = self._make_layer(128, stride=2)

        self.outputs08 = nn.ModuleList([
            nn.Sequential(ResidualBlock(128, 128, norm_fn, stride=1),
                          nn.Conv2d(128, dim[2], 3, padding=1))
            for dim in output_dim
        ])
        self.outputs16 = nn.ModuleList([
            nn.Sequential(ResidualBlock(128, 128, norm_fn, stride=1),
                          nn.Conv2d(128, dim[1], 3, padding=1))
            for dim in output_dim
        ])
        self.outputs32 = nn.ModuleList([
            nn.Conv2d(128, dim[0], 3, padding=1) for dim in output_dim
        ])

    def _make_layer(self, dim, stride=1):
        layers = (
            ResidualBlock(self.in_planes, dim, self.norm_fn, stride=stride),
            ResidualBlock(dim, dim, self.norm_fn, stride=1),
        )
        self.in_planes = dim
        return nn.Sequential(*layers)

    def forward(self, x, num_layers=3):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        outputs08 = [f(x) for f in self.outputs08]
        y = self.layer4(x)
        outputs16 = [f(y) for f in self.outputs16]
        z = self.layer5(y)
        outputs32 = [f(z) for f in self.outputs32]
        return (outputs08, outputs16, outputs32)


def pool2x(x):
    return F.avg_pool2d(x, 3, stride=2, padding=1)


def interp(x, dest):
    return F.interpolate(x, dest.shape[2:], mode="bilinear", align_corners=True)


class ConvGRU(nn.Module):
    def __init__(self, hidden_dim, input_dim, kernel_size=3):
        super().__init__()
        self.convz = nn.Conv2d(hidden_dim + input_dim, hidden_dim, kernel_size,
                               padding=kernel_size // 2)
        self.convr = nn.Conv2d(hidden_dim + input_dim, hidden_dim, kernel_size,
                               padding=kernel_size // 2)
        self.convq = nn.Conv2d(hidden_dim + input_dim, hidden_dim, kernel_size,
                               padding=kernel_size // 2)

    def forward(self, h, cz, cr, cq, *x_list):
        x = torch.cat(x_list, dim=1)
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx) + cz)
        r = torch.sigmoid(self.convr(hx) + cr)
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)) + cq)
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_levels=4, corr_radius=4):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1)
        self.convc1 = nn.Conv2d(cor_planes, 64, 1, padding=0)
        self.convc2 = nn.Conv2d(64, 64, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 64, 7, padding=3)
        self.convf2 = nn.Conv2d(64, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 64, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class FlowHead(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256, output_dim=2):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, output_dim, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class BasicMultiUpdateBlock(nn.Module):
    def __init__(self, hidden_dims=(128, 128, 128)):
        super().__init__()
        self.encoder = BasicMotionEncoder()
        encoder_output_dim = 128
        self.gru04 = ConvGRU(hidden_dims[2], encoder_output_dim + hidden_dims[1])
        self.gru08 = ConvGRU(hidden_dims[1], hidden_dims[0] + hidden_dims[2])
        self.gru16 = ConvGRU(hidden_dims[0], hidden_dims[1])
        self.flow_head = FlowHead(hidden_dims[2], hidden_dim=256, output_dim=2)
        factor = 4  # 2**n_downsample
        self.mask = nn.Sequential(
            nn.Conv2d(hidden_dims[2], 256, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, (factor**2) * 9, 1, padding=0),
        )

    def forward(self, net, inp, corr=None, flow=None, iter04=True, iter08=True,
                iter16=True, update=True):
        if iter16:
            net[2] = self.gru16(net[2], *(inp[2]), pool2x(net[1]))
        if iter08:
            net[1] = self.gru08(net[1], *(inp[1]), pool2x(net[0]),
                                interp(net[2], net[1]))
        if iter04:
            motion_features = self.encoder(flow, corr)
            net[0] = self.gru04(net[0], *(inp[0]), motion_features,
                                interp(net[1], net[0]))
        if not update:
            return net
        delta_flow = self.flow_head(net[0])
        mask = 0.25 * self.mask(net[0])
        return net, mask, delta_flow


def coords_grid(batch, ht, wd):
    coords = torch.meshgrid(torch.arange(ht), torch.arange(wd), indexing="ij")
    coords = torch.stack(coords[::-1], dim=0).float()
    return coords[None].repeat(batch, 1, 1, 1)


def bilinear_sampler_1d(img, coords):
    """img (N, C, 1, W), coords (N, H', W', 2) pixel coords, y degenerate."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CorrBlock1D:
    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        corr = CorrBlock1D.corr(fmap1, fmap2)
        batch, h1, w1, dim, w2 = corr.shape
        corr = corr.reshape(batch * h1 * w1, dim, 1, w2)
        self.corr_pyramid = [corr]
        for _ in range(self.num_levels):
            corr = F.avg_pool2d(corr, [1, 2], stride=[1, 2])
            self.corr_pyramid.append(corr)

    def __call__(self, coords):
        r = self.radius
        coords = coords[:, :1].permute(0, 2, 3, 1)
        batch, h1, w1, _ = coords.shape
        out_pyramid = []
        for i in range(self.num_levels):
            corr = self.corr_pyramid[i]
            dx = torch.linspace(-r, r, 2 * r + 1)
            dx = dx.view(1, 1, 2 * r + 1, 1)
            x0 = dx + coords.reshape(batch * h1 * w1, 1, 1, 1) / 2**i
            y0 = torch.zeros_like(x0)
            coords_lvl = torch.cat([x0, y0], dim=-1)
            corr = bilinear_sampler_1d(corr, coords_lvl)
            out_pyramid.append(corr.view(batch, h1, w1, -1))
        out = torch.cat(out_pyramid, dim=-1)
        return out.permute(0, 3, 1, 2).contiguous().float()

    @staticmethod
    def corr(fmap1, fmap2):
        B, D, H, W1 = fmap1.shape
        _, _, _, W2 = fmap2.shape
        corr = torch.einsum("aijk,aijh->ajkh", fmap1, fmap2)
        corr = corr.reshape(B, H, W1, 1, W2).contiguous()
        return corr / torch.sqrt(torch.tensor(D).float())


class RAFTStereo(nn.Module):
    def __init__(self, n_gru_layers=3, hidden_dims=(128, 128, 128)):
        super().__init__()
        self.n_gru_layers = n_gru_layers
        self.hidden_dims = hidden_dims
        context_dims = hidden_dims
        self.cnet = MultiBasicEncoder(
            output_dim=(hidden_dims, context_dims), norm_fn="batch", downsample=2
        )
        self.update_block = BasicMultiUpdateBlock(hidden_dims)
        self.context_zqr_convs = nn.ModuleList([
            nn.Conv2d(context_dims[i], hidden_dims[i] * 3, 3, padding=1)
            for i in range(n_gru_layers)
        ])
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance", downsample=2)

    def initialize_flow(self, img):
        N, _, H, W = img.shape
        return coords_grid(N, H, W), coords_grid(N, H, W)

    def upsample_flow(self, flow, mask):
        N, D, H, W = flow.shape
        factor = 4
        mask = mask.view(N, 1, 9, factor, factor, H, W)
        mask = torch.softmax(mask, dim=2)
        up_flow = F.unfold(factor * flow, [3, 3], padding=1)
        up_flow = up_flow.view(N, D, 9, 1, 1, H, W)
        up_flow = torch.sum(mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
        return up_flow.reshape(N, D, factor * H, factor * W)

    def forward(self, image1, image2, iters=32, test_mode=True):
        image1 = (2 * (image1 / 255.0) - 1.0).contiguous()
        image2 = (2 * (image2 / 255.0) - 1.0).contiguous()

        fmap1, fmap2 = self.fnet([image1, image2])
        cnet_list = self.cnet(image1, num_layers=self.n_gru_layers)
        net_list = [torch.tanh(x[0]) for x in cnet_list]
        inp_list = [torch.relu(x[1]) for x in cnet_list]
        inp_list = [
            list(conv(i).split(split_size=conv.out_channels // 3, dim=1))
            for i, conv in zip(inp_list, self.context_zqr_convs)
        ]

        corr_fn = CorrBlock1D(fmap1.float(), fmap2.float())
        coords0, coords1 = self.initialize_flow(net_list[0])

        flow_up = None
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net_list, up_mask, delta_flow = self.update_block(
                net_list, inp_list, corr, flow,
                iter16=self.n_gru_layers == 3, iter08=self.n_gru_layers >= 2,
            )
            delta_flow[:, 1] = 0.0
            coords1 = coords1 + delta_flow

        flow_up = self.upsample_flow(coords1 - coords0, up_mask)
        flow_up = flow_up[:, :1]
        if test_mode:
            return coords1 - coords0, flow_up
        raise NotImplementedError
