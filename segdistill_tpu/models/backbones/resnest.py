"""ResNeSt: ResNetV1d with split attention in the 3x3 conv
(ref contract: mmseg/models/backbones/resnest.py:270)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, NormLayer
from .resnet import ResNet, _downsample


class SplitAttentionConv(nn.Module):
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        r = self.radix
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        out = nn.Conv(self.channels * r,
                      (self.kernel_size, self.kernel_size),
                      strides=self.stride, padding=self.dilation,
                      kernel_dilation=self.dilation,
                      feature_group_count=self.groups * r, use_bias=False,
                      dtype=x.dtype, name='conv')(x)
        out = NormLayer(self.norm_cfg, name='bn0')(out, train=train)
        out = nn.relu(out)
        b, h, w, _ = out.shape
        splits = out.reshape(b, h, w, r, self.channels)
        # fc1/fc2 are 1x1 grouped convs in the reference (resnest.py:
        # 100-106) — kept as convs on the (B,1,1,C) pooled map so the
        # checkpoint converter's 4D kernel path applies
        gap = jnp.sum(splits, axis=3).mean(axis=(1, 2),
                                           keepdims=True)  # (B,1,1,C)
        gap = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                      dtype=x.dtype, name='fc1')(gap)
        gap = nn.relu(NormLayer(self.norm_cfg, name='bn1')(gap,
                                                           train=train))
        atten = nn.Conv(self.channels * r, (1, 1),
                        feature_group_count=self.groups, dtype=x.dtype,
                        name='fc2')(gap).reshape(b, r, self.channels)
        atten = nn.softmax(atten, axis=1) if r > 1 else nn.sigmoid(atten)
        return jnp.sum(splits * atten[:, None, None], axis=3)


class SABottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    avg_down: bool = True
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    avg_down_stride: bool = True
    norm_cfg: dict = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        width = int(self.planes
                    * (self.base_width / self.base_channels)) * self.groups \
            if self.groups != 1 else self.planes
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=x.dtype,
                      name='conv1')(x)
        out = NormLayer(self.norm_cfg, name='bn1')(out, train=train)
        out = nn.relu(out)
        use_avd = self.avg_down_stride and self.stride > 1
        out = SplitAttentionConv(
            width, stride=1 if use_avd else self.stride,
            dilation=self.first_dilation, groups=self.groups,
            radix=self.radix, norm_cfg=self.norm_cfg,
            name='conv2')(out, train=train)
        if use_avd:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=[(1, 1), (1, 1)])
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=x.dtype, name='conv3')(out)
        out = NormLayer(self.norm_cfg, name='bn3')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * 4, self.stride,
                                   True, self.norm_cfg, train)
        out = nn.relu(out + identity)
        self.sow('feats', 'OUT', out)
        return out


@BACKBONES.register_module(name='ResNeSt')
def ResNeSt(depth=50, radix=2, reduction_factor=4, avg_down_stride=True,
            groups=1, base_width=4, **kwargs):
    """Registered as a parameterization of ResNet with the split-attention
    bottleneck swapped in via arch override."""
    kwargs.pop('style', None)
    if (radix, reduction_factor, avg_down_stride, groups, base_width) != \
            (2, 4, True, 1, 4):
        # SABottleneck fields carry these as defaults; non-default values
        # are not threaded through the ResNet stage loop
        raise NotImplementedError(
            'ResNeSt supports the reference defaults radix=2, '
            'reduction_factor=4, avg_down_stride=True, groups=1, '
            'base_width=4 (ref resnest.py:289-300)')

    class _ResNeSt(ResNet):
        arch_settings = {
            50: (SABottleneck, (3, 4, 6, 3)),
            101: (SABottleneck, (3, 4, 23, 3)),
            152: (SABottleneck, (3, 8, 36, 3)),
            200: (SABottleneck, (3, 24, 36, 3)),
        }

    return _ResNeSt(depth=depth, deep_stem=True, avg_down=True, **kwargs)
