"""MobileNetV3 backbone (ref contract: mmseg/models/backbones/
mobilenet_v3.py:15-259).

Semantic-segmentation conversion per the reference (:173-216): the
reference builds the classification net then mutates it — small: layer4
and layer9 depthwise strides -> 1, layers 4-8 dilation 2, layers 9-12
dilation 4; large: layer7/layer13 strides -> 1, layers 7-12 dilation 2,
layers 13-16 dilation 4; depthwise padding = dilation * (k-1)//2. Here
the same net is built directly with those strides/dilations. layer0 uses
Conv2dAdaptivePadding (TF-SAME, asymmetric for even inputs, :115-121).
``reduction_factor`` divides mid/out channels of the late blocks
(small i>=8, large i>=12, :127-132).
"""

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
# seg-conversion tables keyed by layer number n = i + 1 (ref :173-216)
_SEG = {
    'small': dict(stride1={4, 9}, dil2=range(4, 9), dil4=range(9, 13)),
    'large': dict(stride1={7, 13}, dil2=range(7, 13), dil4=range(13, 17)),
}


def _same_pad(size, k, s):
    """TF-SAME total padding (mmcv Conv2dAdaptivePadding semantics)."""
    return max((-(-size // s) - 1) * s + k - size, 0)


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
        seg = _SEG[self.arch]

        outs = []
        # layer0: 3x3 s2 with Conv2dAdaptivePadding (asymmetric TF-SAME)
        ph = _same_pad(x.shape[1], 3, 2)
        pw = _same_pad(x.shape[2], 3, 2)
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
        x = ConvModule(out_channels=16, kernel_size=3, stride=2, padding=0,
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name='layer0')(x, train=norm_train)
        if 0 in self.out_indices:
            outs.append(x)
        in_ch = 16
        for i, (k, mid, out_ch, with_se, act, stride) in enumerate(layers):
            n = i + 1
            late = (self.arch == 'small' and i >= 8) or \
                (self.arch == 'large' and i >= 12)
            if late:
                mid = mid // self.reduction_factor
                out_ch = out_ch // self.reduction_factor
            se_cfg = dict(channels=mid, ratio=4) if with_se else None
            dilation = 2 if n in seg['dil2'] else \
                4 if n in seg['dil4'] else 1
            x = InvertedResidualV3(
                out_channels=out_ch, mid_channels=mid, kernel_size=k,
                stride=1 if n in seg['stride1'] else stride,
                dilation=dilation, se_cfg=se_cfg,
                with_expand_conv=(in_ch != mid),
                norm_cfg=norm_cfg, act_cfg=dict(type=act),
                name=f'layer{n}')(x, train=norm_train)
            in_ch = out_ch
            if n in self.out_indices:
                outs.append(x)
        final_ch = 576 if self.arch == 'small' else 960  # not reduced (ref :160)
        x = ConvModule(out_channels=final_ch, kernel_size=1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name=f'layer{len(layers) + 1}')(x, train=norm_train)
        if (len(layers) + 1) in self.out_indices:
            outs.append(x)
        return tuple(outs)
