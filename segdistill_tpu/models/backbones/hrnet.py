"""HRNet backbone (ref contract: mmseg/models/backbones/hrnet.py:212-555).

Multi-resolution parallel branches with repeated cross-resolution fusion.
Config surface matches mmseg's ``extra`` dict (stage1..stage4 with
num_modules/num_branches/num_blocks/num_channels/block).

Naming mirrors the reference state-dict layout through the converter's
HRNet rules: bare stem ``conv1/bn1/conv2/bn2`` (ref :290-312), stage-1
blocks ``layer1_{i}``, transitions ``transition{n}_{i}[_{j}]``
(ref :371-417), branch blocks ``stage{s}_m{m}_b{b}.block_{k}`` and fuse
convs ``stage{s}_m{m}_fuse.fuse_{i}_{j}[_{k}]`` (ref HRModule :119-207).

Fuse upsampling: the reference applies ``Upsample(scale_factor=2**(j-i))``
inside the fuse layer and then a ``resize`` to the exact target inside
``HRModule.forward`` (:200-204) — a no-op whenever spatial sizes are exact
powers-of-two multiples (any /32-divisible input). This implementation
does the single direct resize; inputs whose branch sizes are not exact
multiples would see the reference's double interpolation instead.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import BACKBONES
from ..utils import ConvModule, NormLayer
from .resnet import BasicBlock, Bottleneck


class _Branch(nn.Module):
    block: str
    num_blocks: int
    channels: int
    norm_cfg: dict

    @nn.compact
    def __call__(self, x, train=False):
        cls = BasicBlock if self.block == 'BASIC' else Bottleneck
        expansion = cls.expansion
        for i in range(self.num_blocks):
            need_ds = (i == 0
                       and x.shape[-1] != self.channels * expansion)
            x = cls(planes=self.channels, downsample=need_ds,
                    norm_cfg=self.norm_cfg, name=f'block_{i}')(x,
                                                               train=train)
        return x


class _FuseLayer(nn.Module):
    """Cross-resolution fusion: each output branch sums transformed inputs
    from every branch (upsample via 1x1 conv+bn then bilinear resize,
    downsample via strided 3x3 conv+bn chains with ReLU on all but the
    last; ref hrnet.py:119-207)."""
    num_branches: int
    channels: tuple
    norm_cfg: dict

    @nn.compact
    def __call__(self, xs, train=False):
        outs = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                y = xs[j]
                if j > i:  # upsample j -> i
                    y = ConvModule(out_channels=self.channels[i],
                                   kernel_size=1, norm_cfg=self.norm_cfg,
                                   act_cfg=None,
                                   name=f'fuse_{i}_{j}')(y, train=train)
                    y = resize(y, size=xs[i].shape[1:3], mode='bilinear',
                               align_corners=False)
                elif j < i:  # downsample j -> i via (i-j) stride-2 convs
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        y = ConvModule(
                            out_channels=self.channels[i] if last
                            else self.channels[j],
                            kernel_size=3, stride=2, padding=1,
                            norm_cfg=self.norm_cfg,
                            act_cfg=None if last else dict(type='ReLU'),
                            name=f'fuse_{i}_{j}_{k}')(y, train=train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Any = None
    in_channels: int = 3
    norm_cfg: dict = None
    norm_eval: bool = False
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')
        norm_train = train and not self.norm_eval
        extra = self.extra

        # stem: two stride-2 bare conv+bn+relu (ref :290-312) -> 1/4
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=x.dtype, name=f'conv{i}')(x)
            x = NormLayer(norm_cfg, name=f'bn{i}')(x, train=norm_train)
            x = nn.relu(x)

        # stage 1 (single branch of Bottlenecks, ref layer1)
        s1 = extra['stage1']
        cls = BasicBlock if s1['block'] == 'BASIC' else Bottleneck
        for i in range(s1['num_blocks'][0]):
            need_ds = (i == 0 and x.shape[-1]
                       != s1['num_channels'][0] * cls.expansion)
            x = cls(planes=s1['num_channels'][0], downsample=need_ds,
                    norm_cfg=norm_cfg, name=f'layer1_{i}')(x,
                                                           train=norm_train)

        branches = [x]
        for si, stage_key in enumerate(['stage2', 'stage3', 'stage4']):
            cfg = extra[stage_key]
            nb = cfg['num_branches']
            expansion = 1 if cfg['block'] == 'BASIC' else 4
            out_ch = [c * expansion for c in cfg['num_channels']]
            # transition: adapt existing / extend new branches
            # (ref _make_transition_layer :371-417 + forward :521-543:
            # a non-None transition is always fed the LAST branch)
            new_branches = []
            for bi in range(nb):
                if bi < len(branches) \
                        and branches[bi].shape[-1] == out_ch[bi]:
                    new_branches.append(branches[bi])
                elif bi < len(branches):
                    new_branches.append(ConvModule(
                        out_channels=out_ch[bi], kernel_size=3, padding=1,
                        norm_cfg=norm_cfg,
                        name=f'transition{si + 1}_{bi}')(
                            branches[-1], train=norm_train))
                else:
                    # chain of stride-2 convs from the last branch; only
                    # the final one changes channel count (ref :397-414)
                    y = branches[-1]
                    steps = bi + 1 - len(branches)
                    for j in range(steps):
                        ch = out_ch[bi] if j == steps - 1 else y.shape[-1]
                        y = ConvModule(
                            out_channels=ch, kernel_size=3, stride=2,
                            padding=1, norm_cfg=norm_cfg,
                            name=f'transition{si + 1}_{bi}_{j}')(
                                y, train=norm_train)
                    new_branches.append(y)
            branches = new_branches
            # modules: per-branch blocks + fusion
            for mi in range(cfg['num_modules']):
                branches = [
                    _Branch(cfg['block'], cfg['num_blocks'][bi],
                            cfg['num_channels'][bi], norm_cfg,
                            name=f'{stage_key}_m{mi}_b{bi}')(
                        branches[bi], train=norm_train)
                    for bi in range(nb)]
                branches = _FuseLayer(nb, tuple(out_ch), norm_cfg,
                                      name=f'{stage_key}_m{mi}_fuse')(
                    branches, train=norm_train)
        return tuple(branches)
