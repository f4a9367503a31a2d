"""Inverted residual blocks for MobileNetV2/V3
(ref contract: mmseg/models/utils/inverted_residual.py)."""

import flax.linen as nn
import jax.numpy as jnp

from .conv_module import ConvModule
from .se_layer import SELayer


class InvertedResidual(nn.Module):
    in_channels: int = None
    out_channels: int = None
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        hidden_dim = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.out_channels
        act_cfg = self.act_cfg or dict(type='ReLU6')
        out = x
        if self.expand_ratio != 1:
            out = ConvModule(out_channels=hidden_dim, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=act_cfg,
                             name='expand_conv')(out, train)
        out = ConvModule(out_channels=hidden_dim, kernel_size=3,
                         stride=self.stride, padding=self.dilation,
                         dilation=self.dilation, groups=hidden_dim,
                         norm_cfg=self.norm_cfg, act_cfg=act_cfg,
                         name='depthwise_conv')(out, train)
        out = ConvModule(out_channels=self.out_channels, kernel_size=1,
                         norm_cfg=self.norm_cfg, act_cfg=None,
                         name='linear_conv')(out, train)
        if use_res:
            out = x + out
        return out


class InvertedResidualV3(nn.Module):
    in_channels: int = None
    out_channels: int = None
    mid_channels: int = None
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1  # MNv3 seg conversion dilates the depthwise conv
    se_cfg: dict = None
    with_expand_conv: bool = True
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        use_res = self.stride == 1 and in_ch == self.out_channels
        act_cfg = self.act_cfg or dict(type='ReLU')
        out = x
        if self.with_expand_conv:
            out = ConvModule(out_channels=self.mid_channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=act_cfg,
                             name='expand_conv')(out, train)
        if self.stride == 2:
            # ref inverted_residual.py:157-166: stride-2 depthwise uses
            # Conv2dAdaptivePadding (TF-SAME, asymmetric on even inputs)
            k, s = self.kernel_size, self.stride

            def _same(size):
                return max((-(-size // s) - 1) * s
                           + (k - 1) * self.dilation + 1 - size, 0)

            ph, pw = _same(out.shape[1]), _same(out.shape[2])
            out = jnp.pad(out, ((0, 0), (ph // 2, ph - ph // 2),
                                (pw // 2, pw - pw // 2), (0, 0)))
            dw_pad = 0
        else:
            dw_pad = self.dilation * (self.kernel_size - 1) // 2
        out = ConvModule(out_channels=self.mid_channels,
                         kernel_size=self.kernel_size, stride=self.stride,
                         padding=dw_pad,
                         dilation=self.dilation,
                         groups=self.mid_channels,
                         norm_cfg=self.norm_cfg, act_cfg=act_cfg,
                         name='depthwise_conv')(out, train)
        if self.se_cfg is not None:
            out = SELayer(**self.se_cfg, name='se')(out, train)
        out = ConvModule(out_channels=self.out_channels, kernel_size=1,
                         norm_cfg=self.norm_cfg, act_cfg=None,
                         name='linear_conv')(out, train)
        if use_res:
            out = x + out
        return out
