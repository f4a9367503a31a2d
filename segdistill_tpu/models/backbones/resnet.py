"""ResNet backbone family, TPU-native NHWC.

Functional equivalent of the reference's ResNet/V1c/V1d
(``mmseg/models/backbones/resnet.py:308-688``): torchvision-layout stages,
'pytorch' style (stride on the 3x3 conv of Bottleneck), per-stage
strides/dilations for the d8 variants, ``contract_dilation``, deep stem (V1c)
and avg-down (V1d). BatchNorm under jit over the sharded global batch is
SyncBN by construction (see models/utils/norm.py).

Every residual block sows its output under the tap name
``backbone.layer{s}.{i}`` (the reference's hookable module names).
``frozen_stages``/``norm_eval`` freezing is enforced by the optimizer mask +
``norm_eval`` flag rather than mutating module state.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, NormLayer


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    norm_cfg: dict = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=self.first_dilation,
                      kernel_dilation=self.first_dilation, use_bias=False,
                      dtype=x.dtype, name='conv1')(x)
        out = NormLayer(self.norm_cfg, name='bn1')(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation, use_bias=False,
                      dtype=x.dtype, name='conv2')(out)
        out = NormLayer(self.norm_cfg, name='bn2')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes, self.stride,
                                   self.avg_down, self.norm_cfg, train)
        out = nn.relu(out + identity)
        self.sow('feats', 'OUT', out)
        return out


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    groups: int = 1
    width_per_group: int = 4
    base_channels: int = 64
    use_groups: bool = False  # ResNeXt-style grouped 3x3
    norm_cfg: dict = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        if self.use_groups:
            # ref resnext.py:27-31: floor BEFORE multiplying by groups
            width = (self.planes * self.width_per_group
                     // self.base_channels) * self.groups
            groups = self.groups
        else:
            width = self.planes
            groups = 1
        # 'pytorch' style: stride lives on the 3x3 conv (ref resnet.py:160)
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=x.dtype,
                      name='conv1')(x)
        out = NormLayer(self.norm_cfg, name='bn1')(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=self.stride,
                      padding=self.first_dilation,
                      kernel_dilation=self.first_dilation,
                      feature_group_count=groups, use_bias=False,
                      dtype=x.dtype, name='conv2')(out)
        out = NormLayer(self.norm_cfg, name='bn2')(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=x.dtype, name='conv3')(out)
        out = NormLayer(self.norm_cfg, name='bn3')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down,
                                   self.norm_cfg, train)
        out = nn.relu(out + identity)
        self.sow('feats', 'OUT', out)
        return out


class _Downsample(nn.Module):
    features: int
    stride: int
    avg_down: bool
    norm_cfg: dict

    @nn.compact
    def __call__(self, x, train=False):
        if self.avg_down and self.stride != 1:
            x = nn.avg_pool(x, (self.stride, self.stride),
                            strides=(self.stride, self.stride),
                            padding=[(0, 0), (0, 0)])
            stride = 1
        else:
            stride = self.stride
        x = nn.Conv(self.features, (1, 1), strides=stride, use_bias=False,
                    dtype=x.dtype, name='conv')(x)
        x = NormLayer(self.norm_cfg, name='bn')(x, train=train)
        return x


def _downsample(x, features, stride, avg_down, norm_cfg, train):
    return _Downsample(features, stride, avg_down, norm_cfg,
                       name='downsample')(x, train=train)


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = 'pytorch'
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    norm_cfg: dict = None
    norm_eval: bool = False
    contract_dilation: bool = False
    multi_grid: Sequence[int] = None
    groups: int = 1
    width_per_group: int = 4
    use_groups: bool = False
    with_cp: bool = False  # accepted for config parity; remat lands on transformer backbones first
    zero_init_residual: bool = True
    dcn: dict = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    pretrained: str = None
    dtype: jnp.dtype = jnp.float32

    TAP_RENAMES = [(r'^layer(\d+)_(\d+)$', r'layer\1.\2')]

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        block_cls, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        norm_train = train and not self.norm_eval

        # stem
        if self.deep_stem:
            half = self.stem_channels // 2
            for j, (feats, stride) in enumerate(
                    [(half, 2), (half, 1), (self.stem_channels, 1)]):
                x = nn.Conv(feats, (3, 3), strides=stride, padding=1,
                            use_bias=False, dtype=x.dtype,
                            name=f'stem_conv{j + 1}')(x)
                x = NormLayer(self.norm_cfg,
                              name=f'stem_bn{j + 1}')(x, train=norm_train)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=2, padding=3,
                        use_bias=False, dtype=x.dtype, name='conv1')(x)
            x = NormLayer(self.norm_cfg, name='bn1')(x, train=norm_train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = self.base_channels
        in_features = self.stem_channels
        for s, num_blocks in enumerate(stage_blocks):
            stride = self.strides[s]
            dilation = self.dilations[s]
            out_features = planes * block_cls.expansion
            for i in range(num_blocks):
                blk_stride = stride if i == 0 else 1
                if self.multi_grid is not None and s == len(stage_blocks) - 1:
                    first_dil = dilation * self.multi_grid[i]
                elif (i == 0 and dilation > 1 and self.contract_dilation):
                    first_dil = dilation // 2
                else:
                    first_dil = dilation
                need_ds = (i == 0 and (blk_stride != 1
                                       or in_features != out_features))
                kwargs = dict(planes=planes, stride=blk_stride,
                              dilation=dilation, first_dilation=first_dil,
                              downsample=need_ds, avg_down=self.avg_down,
                              norm_cfg=self.norm_cfg,
                              name=f'layer{s + 1}_{i}')
                if block_cls is Bottleneck:
                    kwargs.update(groups=self.groups,
                                  width_per_group=self.width_per_group,
                                  base_channels=self.base_channels,
                                  use_groups=self.use_groups)
                x = block_cls(**kwargs)(x, train=norm_train)
                in_features = out_features
            if s in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


@BACKBONES.register_module(name='ResNetV1c')
def ResNetV1c(**kwargs):
    """ResNet with deep 3x3 stem (ref: resnet.py:662-676)."""
    kwargs.pop('style', None)
    return ResNet(deep_stem=True, avg_down=False, **kwargs)


@BACKBONES.register_module(name='ResNetV1d')
def ResNetV1d(**kwargs):
    """Deep stem + avg-down shortcuts (ref: resnet.py:678-688)."""
    kwargs.pop('style', None)
    return ResNet(deep_stem=True, avg_down=True, **kwargs)
