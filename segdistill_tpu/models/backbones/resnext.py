"""ResNeXt = ResNet with grouped 3x3 bottleneck convs
(ref contract: mmseg/models/backbones/resnext.py:87)."""

from ..builder import BACKBONES
from .resnet import ResNet


@BACKBONES.register_module(name='ResNeXt')
def ResNeXt(groups=32, base_width=4, **kwargs):
    kwargs.pop('style', None)
    return ResNet(groups=groups, width_per_group=base_width,
                  use_groups=True, **kwargs)
