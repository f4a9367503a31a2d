"""Feature Pyramid Network neck (ref contract: mmseg/models/necks/fpn.py:9)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import NECKS
from ..utils import ConvModule


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = None
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, inputs, train=False):
        num_ins = len(self.in_channels)
        end_level = num_ins if self.end_level == -1 else self.end_level
        backbone_end_level = end_level
        used = range(self.start_level, backbone_end_level)

        laterals = [
            ConvModule(out_channels=self.out_channels, kernel_size=1,
                       norm_cfg=None if self.no_norm_on_lateral
                       else self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'lateral_convs_{i - self.start_level}')(
                           inputs[i], train=train)
            for i in used
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], size=laterals[i - 1].shape[1:3], mode='nearest')

        outs = [
            ConvModule(out_channels=self.out_channels, kernel_size=3,
                       padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg, name=f'fpn_convs_{i}')(
                           laterals[i], train=train)
            for i in range(len(laterals))
        ]
        # extra outputs by max-pool downsampling (mmseg default path)
        if self.num_outs > len(outs) and not self.add_extra_convs:
            for _ in range(self.num_outs - len(outs)):
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
