"""MobileNetV3 backbone (ref contract: mmseg/models/backbones/mobilenet_v3.py:15)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, InvertedResidualV3


# (kernel, mid_channels, out_channels, with_se, act, stride)
_ARCH = {
    'small': [(3, 16, 16, True, 'ReLU', 2), (3, 72, 24, False, 'ReLU', 2),
              (3, 88, 24, False, 'ReLU', 1), (5, 96, 40, True, 'HSwish', 2),
              (5, 240, 40, True, 'HSwish', 1),
              (5, 240, 40, True, 'HSwish', 1),
              (5, 120, 48, True, 'HSwish', 1),
              (5, 144, 48, True, 'HSwish', 1),
              (5, 288, 96, True, 'HSwish', 2),
              (5, 576, 96, True, 'HSwish', 1),
              (5, 576, 96, True, 'HSwish', 1)],
    'large': [(3, 16, 16, False, 'ReLU', 1), (3, 64, 24, False, 'ReLU', 2),
              (3, 72, 24, False, 'ReLU', 1), (5, 72, 40, True, 'ReLU', 2),
              (5, 120, 40, True, 'ReLU', 1), (5, 120, 40, True, 'ReLU', 1),
              (3, 240, 80, False, 'HSwish', 2),
              (3, 200, 80, False, 'HSwish', 1),
              (3, 184, 80, False, 'HSwish', 1),
              (3, 184, 80, False, 'HSwish', 1),
              (3, 480, 112, True, 'HSwish', 1),
              (3, 672, 112, True, 'HSwish', 1),
              (5, 672, 160, True, 'HSwish', 2),
              (5, 960, 160, True, 'HSwish', 1),
              (5, 960, 160, True, 'HSwish', 1)],
}


@BACKBONES.register_module()
class MobileNetV3(nn.Module):
    arch: str = 'small'
    out_indices: Sequence[int] = (0, 1, 12)
    frozen_stages: int = -1
    norm_cfg: dict = None
    norm_eval: bool = False
    reduction_factor: int = 1
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        norm_train = train and not self.norm_eval
        layers = _ARCH[self.arch]

        outs = []
        x = ConvModule(out_channels=16, kernel_size=3, stride=2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name='layer0')(x, train=norm_train)
        if 0 in self.out_indices:
            outs.append(x)
        for i, (k, mid, out_ch, with_se, act, stride) in enumerate(layers):
            se_cfg = dict(channels=mid, ratio=4) if with_se else None
            x = InvertedResidualV3(
                out_channels=out_ch, mid_channels=mid, kernel_size=k,
                stride=stride, se_cfg=se_cfg,
                with_expand_conv=(mid != x.shape[-1] or i > 0),
                norm_cfg=norm_cfg, act_cfg=dict(type=act),
                name=f'layer{i + 1}')(x, train=norm_train)
            if (i + 1) in self.out_indices:
                outs.append(x)
        final_ch = 576 if self.arch == 'small' else 960
        x = ConvModule(out_channels=final_ch, kernel_size=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name=f'layer{len(layers) + 1}')(x, train=norm_train)
        if (len(layers) + 1) in self.out_indices:
            outs.append(x)
        return tuple(outs)
