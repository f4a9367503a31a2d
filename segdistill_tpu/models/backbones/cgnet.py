"""CGNet backbone (ref contract: mmseg/models/backbones/cgnet.py:186-365).

Context Guided blocks: local conv + dilated surrounding conv -> joint
BN+PReLU -> global context gate. Structural details per the reference:

* every activation is a learnable per-channel PReLU, zero-initialised by
  the reference's init_weights (ref :354-355);
* input injection is a chain of 3x3 s2 p1 average pools (1 for 1/2,
  2 chained for 1/4 — NOT a single 5x5 s4 pool; ref InputInjection
  :170-182, count_include_pad semantics);
* stage outputs concatenate the stage's FIRST (downsampling) block
  output too: stage1 = cat[x, down1, inp_4x] (2*C1+3 ch), stage2 =
  cat[down2, x] (2*C2 ch) — ref forward :313-334;
* the downsample bottleneck is a bias-free bare 1x1 conv (ref :131-137).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..utils import ConvModule, NormLayer
from ..utils.activation import PReLU

_PRELU0 = dict(type='PReLU', init=0.0)


class _GlobalContext(nn.Module):
    """GlobalContextExtractor (ref cgnet.py:13-50): squeeze-excite gate."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2))
        g = nn.relu(nn.Dense(max(c // self.reduction, 1),
                             dtype=x.dtype, name='fc1')(g))
        g = nn.sigmoid(nn.Dense(c, dtype=x.dtype, name='fc2')(g))
        return x * g[:, None, None, :]


class ContextGuidedBlock(nn.Module):
    """ref cgnet.py:53-167."""
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    downsample: bool = False
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        channels = self.out_channels if self.downsample \
            else self.out_channels // 2
        stride = 2 if self.downsample else 1
        ksize = 3 if self.downsample else 1
        h = ConvModule(out_channels=channels, kernel_size=ksize,
                       stride=stride, padding=(ksize - 1) // 2,
                       norm_cfg=self.norm_cfg, act_cfg=_PRELU0,
                       name='conv1x1')(x, train=train)
        loc = nn.Conv(channels, (3, 3), padding=1,
                      feature_group_count=channels, use_bias=False,
                      dtype=h.dtype, name='f_loc')(h)
        sur = nn.Conv(channels, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation,
                      feature_group_count=channels, use_bias=False,
                      dtype=h.dtype, name='f_sur')(h)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = NormLayer(self.norm_cfg, name='bn')(joi, train=train)
        joi = PReLU(init=0.0, name='activate')(joi)
        if self.downsample:
            # bias-free bare conv (ref :131-137)
            joi = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          dtype=joi.dtype, name='bottleneck')(joi)
        out = _GlobalContext(self.reduction, name='f_glo')(joi)
        if not self.downsample:
            out = x + out
        return out


@BACKBONES.register_module()
class CGNet(nn.Module):
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)
    norm_cfg: dict = None
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        norm_cfg = self.norm_cfg or dict(type='BN')

        def _inject(v, times):
            # ref InputInjection: chained AvgPool2d(3, stride=2, padding=1)
            # with torch's count_include_pad=True (= flax sum/window_size)
            for _ in range(times):
                v = nn.avg_pool(v, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            return v

        inp2 = _inject(x, 1)
        inp4 = _inject(x, 2)

        # stage 0: 3 convs, stride 2 then 1, 1
        h = x
        for i, stride in enumerate([2, 1, 1]):
            h = ConvModule(out_channels=self.num_channels[0], kernel_size=3,
                           stride=stride, padding=1, norm_cfg=norm_cfg,
                           act_cfg=_PRELU0,
                           name=f'stem_{i}')(h, train=train)
        h = jnp.concatenate([h, inp2], axis=-1)
        h = NormLayer(norm_cfg, name='norm_prelu_0_bn')(h, train=train)
        h = PReLU(init=0.0, name='norm_prelu_0_act')(h)
        outs = [h]

        # stage 1 (first block downsamples; its output re-enters the
        # stage-output concat as down1, ref forward :320-326)
        down1 = None
        for j in range(self.num_blocks[0]):
            h = ContextGuidedBlock(self.num_channels[1],
                                   dilation=self.dilations[0],
                                   reduction=self.reductions[0],
                                   downsample=(j == 0), norm_cfg=norm_cfg,
                                   name=f'level1_{j}')(h, train=train)
            if j == 0:
                down1 = h
        h = jnp.concatenate([h, down1, inp4], axis=-1)
        h = NormLayer(norm_cfg, name='norm_prelu_1_bn')(h, train=train)
        h = PReLU(init=0.0, name='norm_prelu_1_act')(h)
        outs.append(h)

        # stage 2 (concat order is [down2, x], ref :329-334)
        down2 = None
        for j in range(self.num_blocks[1]):
            h = ContextGuidedBlock(self.num_channels[2],
                                   dilation=self.dilations[1],
                                   reduction=self.reductions[1],
                                   downsample=(j == 0), norm_cfg=norm_cfg,
                                   name=f'level2_{j}')(h, train=train)
            if j == 0:
                down2 = h
        h = jnp.concatenate([down2, h], axis=-1)
        h = NormLayer(norm_cfg, name='norm_prelu_2_bn')(h, train=train)
        h = PReLU(init=0.0, name='norm_prelu_2_act')(h)
        outs.append(h)
        return tuple(outs)
