"""Test-only torch oracle for the Wan video VAE weight converter.

The real checkpoint's torch source is diffusers' AutoencoderKLWan
(pipeline_mova.py:15,68), which is NOT in this image — so this is an
independent minimal torch implementation of the same architecture, built
from the checkpoint config fields, with the Wan-official state-dict naming
that convert/load_checkpoint.py:_convert_wan_vae consumes
(encoder.conv1 / encoder.downsamples.N.residual.{0,2,3,6} /
.shortcut / .resample.1 / .time_conv / middle.{0,1,2} / head.{0,2};
decoder mirrored; quant_conv / post_quant_conv).

Semantics follow the reference's ALWAYS-cached streaming recursion in closed
form over the full sequence (identical to dualforce_tpu/models/wan_vae.py's
derivation, re-expressed independently in torch channel-first layout):
  - causal time convs zero-pad (kt-1) frames at the front;
  - temporal downsample: frame-0 passthrough + stride-2 VALID windows
    starting at frame 0;
  - temporal upsample: frame-0 bypass; frames 1.. conv with zero history to
    2C and interleave.

Purpose: a numerical oracle so a wrong kernel transpose in the converter (or
a layout bug in the JAX model) cannot silently corrupt real-checkpoint runs
(VERDICT r2 missing #3).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMS_norm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim, 1, 1, 1))
        self.dim = dim

    def forward(self, x):  # [B,C,T,H,W]
        n = F.normalize(x.float(), dim=1)
        return (n * math.sqrt(self.dim) * self.gamma.float()).to(x.dtype)


class CausalConv3d(nn.Module):
    """Conv3d with (kt-1)-front zero pad in time, symmetric in space."""

    def __init__(self, cin, cout, kernel, stride=(1, 1, 1)):
        super().__init__()
        if isinstance(kernel, int):
            kernel = (kernel, kernel, kernel)
        # weight/bias live directly on the module: keys are `{prefix}.weight`
        self.weight = nn.Parameter(torch.empty(cout, cin, *kernel))
        self.bias = nn.Parameter(torch.empty(cout))
        bound = 1.0 / math.sqrt(cin * kernel[0] * kernel[1] * kernel[2])
        nn.init.uniform_(self.weight, -bound, bound)
        nn.init.uniform_(self.bias, -bound, bound)
        self.stride = stride
        kt, kh, kw = kernel
        self.pad = (kw // 2, kw // 2, kh // 2, kh // 2, kt - 1, 0)

    def forward(self, x):
        return F.conv3d(F.pad(x, self.pad), self.weight, self.bias,
                        stride=self.stride)


class ResidualBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.residual = nn.Sequential(
            RMS_norm(cin), nn.SiLU(), CausalConv3d(cin, cout, 3),
            RMS_norm(cout), nn.SiLU(), nn.Dropout(0.0),
            CausalConv3d(cout, cout, 3))
        self.shortcut = (CausalConv3d(cin, cout, 1) if cin != cout
                         else nn.Identity())

    def forward(self, x):
        return self.residual(x) + self.shortcut(x)


class AttentionBlock(nn.Module):
    """Single-head per-frame spatial self-attention."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.norm = RMS_norm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):  # [B,C,T,H,W]
        identity = x
        b, c, t, h, w = x.shape
        xn = self.norm(x).permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        q, k, v = self.to_qkv(xn).reshape(b * t, 3 * c, h * w).permute(
            0, 2, 1).chunk(3, dim=-1)  # each [bt, hw, c]
        logits = torch.einsum("bqc,bkc->bqk", q.float(), k.float()) * c ** -0.5
        o = torch.einsum("bqk,bkc->bqc", logits.softmax(-1), v.float())
        o = o.to(x.dtype).permute(0, 2, 1).reshape(b * t, c, h, w)
        o = self.proj(o).reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)
        return identity + o


def _per_frame(mod, x):
    b, c, t, h, w = x.shape
    y = mod(x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
    return y.reshape(b, t, *y.shape[1:]).permute(0, 2, 1, 3, 4)


class Downsample2d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resample = nn.Sequential(nn.ZeroPad2d((0, 1, 0, 1)),
                                      nn.Conv2d(dim, dim, 3, stride=2))

    def forward(self, x):
        return _per_frame(self.resample, x)


class Downsample3d(Downsample2d):
    def __init__(self, dim):
        super().__init__(dim)
        self.time_conv = nn.Conv3d(dim, dim, (3, 1, 1), stride=(2, 1, 1))

    def forward(self, x):
        x = _per_frame(self.resample, x)
        # frame-0 passthrough + stride-2 VALID windows from frame 0
        return torch.cat([x[:, :, :1], self.time_conv(x)], dim=2)


class Upsample2d(nn.Module):
    def __init__(self, dim, out_dim):
        super().__init__()
        self.resample = nn.Sequential(nn.Upsample(scale_factor=2.0, mode="nearest"),
                                      nn.Conv2d(dim, out_dim, 3, padding=1))

    def forward(self, x):
        return _per_frame(self.resample, x)


class Upsample3d(Upsample2d):
    def __init__(self, dim, out_dim):
        super().__init__(dim, out_dim)
        self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1))

    def forward(self, x):
        b, c, t, h, w = x.shape
        if t > 1:
            # frame 0 bypasses; frames 1.. conv with zero history, interleave
            y = self.time_conv(x[:, :, 1:])  # [B,2C,T-1,H,W]
            y = y.reshape(b, 2, c, t - 1, h, w).permute(0, 2, 3, 1, 4, 5)
            y = y.reshape(b, c, 2 * (t - 1), h, w)
            x = torch.cat([x[:, :, :1], y], dim=2)
        return _per_frame(self.resample, x)


class Encoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
        self.conv1 = CausalConv3d(3, dims[0], 3)
        downs = []
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            d = din
            for _ in range(cfg.num_res_blocks):
                downs.append(ResidualBlock(d, dout))
                d = dout
            if i != len(cfg.dim_mult) - 1:
                downs.append(Downsample3d(dout) if cfg.temperal_downsample[i]
                             else Downsample2d(dout))
        self.downsamples = nn.Sequential(*downs)
        out = dims[-1]
        self.middle = nn.Sequential(ResidualBlock(out, out),
                                    AttentionBlock(out),
                                    ResidualBlock(out, out))
        self.head = nn.Sequential(RMS_norm(out), nn.SiLU(),
                                  CausalConv3d(out, cfg.z_dim * 2, 3))

    def forward(self, x):
        return self.head(self.middle(self.downsamples(self.conv1(x))))


class Decoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        mult = tuple(cfg.dim_mult)
        dims = [cfg.base_dim * u for u in (mult[-1],) + tuple(reversed(mult))]
        temperal_upsample = tuple(reversed(cfg.temperal_downsample))
        self.conv1 = CausalConv3d(cfg.z_dim, dims[0], 3)
        self.middle = nn.Sequential(ResidualBlock(dims[0], dims[0]),
                                    AttentionBlock(dims[0]),
                                    ResidualBlock(dims[0], dims[0]))
        ups = []
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            if i in (1, 2, 3):
                din = din // 2
            d = din
            for _ in range(cfg.num_res_blocks + 1):
                ups.append(ResidualBlock(d, dout))
                d = dout
            if i != len(mult) - 1:
                ups.append(Upsample3d(dout, dout // 2) if temperal_upsample[i]
                           else Upsample2d(dout, dout // 2))
        self.upsamples = nn.Sequential(*ups)
        self.head = nn.Sequential(RMS_norm(dims[-1]), nn.SiLU(),
                                  CausalConv3d(dims[-1], 3, 3))

    def forward(self, z):
        return self.head(self.upsamples(self.middle(self.conv1(z))))


class WanVAEOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = Encoder3d(cfg)
        self.decoder = Decoder3d(cfg)
        self.quant_conv = nn.Conv3d(cfg.z_dim * 2, cfg.z_dim * 2, 1)
        self.post_quant_conv = nn.Conv3d(cfg.z_dim, cfg.z_dim, 1)

    def encode_moments(self, video):  # [B,3,T,H,W] -> (mean, logvar)
        moments = self.quant_conv(self.encoder(video))
        return moments.chunk(2, dim=1)

    def decode(self, z):  # [B,z,F,h,w] -> [B,3,T,H,W]
        return self.decoder(self.post_quant_conv(z))
