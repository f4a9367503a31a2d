"""Torch oracle for HRNet (ref mmseg/models/backbones/hrnet.py:13-555).

State-dict layout matches the reference exactly: bare stem
``conv1/bn1/conv2/bn2``, ``layer1.{i}`` Bottlenecks, ``transition{n}.{i}``
Sequentials (conv, bn, relu — nested once more for new-branch chains),
``stage{s}.{m}.branches.{b}.{k}`` blocks and
``stage{s}.{m}.fuse_layers.{i}.{j}`` Sequentials (1x1 conv+bn for
upsample paths, chained 3x3 s2 conv+bn[+relu] for downsample paths) —
the keys the production converter's HRNet rules translate. The fuse
upsample path follows the reference's forward: Upsample(scale 2^(j-i))
then resize-to-target (a no-op at power-of-two sizes).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from .resnet import Bottleneck


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


def _blocks(block, inplanes, planes, n):
    layers, ds = [], None
    if inplanes != planes * block.expansion:
        ds = nn.Sequential(
            nn.Conv2d(inplanes, planes * block.expansion, 1, bias=False),
            nn.BatchNorm2d(planes * block.expansion))
    layers.append(block(inplanes, planes, downsample=ds))
    for _ in range(1, n):
        layers.append(block(planes * block.expansion, planes))
    return nn.Sequential(*layers)


class HRModule(nn.Module):
    """ref hrnet.py:13-207."""

    def __init__(self, num_branches, block, num_blocks, in_channels,
                 num_channels):
        super().__init__()
        self.num_branches = num_branches
        self.in_channels = [c for c in in_channels]
        self.branches = nn.ModuleList([
            _blocks(block, in_channels[b], num_channels[b], num_blocks[b])
            for b in range(num_branches)])
        fuse_layers = []
        for i in range(num_branches):
            layer = []
            for j in range(num_branches):
                if j > i:
                    layer.append(nn.Sequential(
                        nn.Conv2d(in_channels[j], in_channels[i], 1,
                                  bias=False),
                        nn.BatchNorm2d(in_channels[i]),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode='bilinear', align_corners=False)))
                elif j == i:
                    layer.append(None)
                else:
                    downs = []
                    for k in range(i - j):
                        if k == i - j - 1:
                            downs.append(nn.Sequential(
                                nn.Conv2d(in_channels[j], in_channels[i],
                                          3, 2, 1, bias=False),
                                nn.BatchNorm2d(in_channels[i])))
                        else:
                            downs.append(nn.Sequential(
                                nn.Conv2d(in_channels[j], in_channels[j],
                                          3, 2, 1, bias=False),
                                nn.BatchNorm2d(in_channels[j]),
                                nn.ReLU(inplace=False)))
                    layer.append(nn.Sequential(*downs))
            fuse_layers.append(nn.ModuleList(layer))
        self.fuse_layers = nn.ModuleList(fuse_layers)

    def forward(self, x):
        x = [self.branches[i](x[i]) for i in range(self.num_branches)]
        outs = []
        for i in range(self.num_branches):
            y = 0
            for j in range(self.num_branches):
                if i == j:
                    y = y + x[j]
                elif j > i:
                    y = y + F.interpolate(self.fuse_layers[i][j](x[j]),
                                          size=x[i].shape[2:],
                                          mode='bilinear',
                                          align_corners=False)
                else:
                    y = y + self.fuse_layers[i][j](x[j])
            outs.append(F.relu(y))
        return outs


class HRNet(nn.Module):
    """ref hrnet.py:212-543."""

    def __init__(self, extra, in_channels=3):
        super().__init__()
        self.extra = extra
        self.conv1 = nn.Conv2d(in_channels, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        blocks = {'BASIC': BasicBlock, 'BOTTLENECK': Bottleneck}

        s1 = extra['stage1']
        b1 = blocks[s1['block']]
        self.layer1 = _blocks(b1, 64, s1['num_channels'][0],
                              s1['num_blocks'][0])
        pre = [s1['num_channels'][0] * b1.expansion]

        for n, key in enumerate(['stage2', 'stage3', 'stage4'], start=1):
            cfg = extra[key]
            block = blocks[cfg['block']]
            cur = [c * block.expansion for c in cfg['num_channels']]
            trans = []
            for i in range(cfg['num_branches']):
                if i < len(pre):
                    if cur[i] != pre[i]:
                        trans.append(nn.Sequential(
                            nn.Conv2d(pre[i], cur[i], 3, 1, 1, bias=False),
                            nn.BatchNorm2d(cur[i]), nn.ReLU(inplace=True)))
                    else:
                        trans.append(None)
                else:
                    downs = []
                    for j in range(i + 1 - len(pre)):
                        in_ch = pre[-1]
                        out_ch = cur[i] if j == i - len(pre) else in_ch
                        downs.append(nn.Sequential(
                            nn.Conv2d(in_ch, out_ch, 3, 2, 1, bias=False),
                            nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True)))
                    trans.append(nn.Sequential(*downs))
            setattr(self, f'transition{n}',
                    nn.ModuleList([t if t is not None else nn.Identity()
                                   for t in trans]))
            self._trans_is_identity = getattr(self, '_trans_is_identity',
                                              {})
            self._trans_is_identity[n] = [t is None for t in trans]
            setattr(self, key, nn.Sequential(*[
                HRModule(cfg['num_branches'], block, cfg['num_blocks'],
                         cur, cfg['num_channels'])
                for _ in range(cfg['num_modules'])]))
            pre = cur

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        y_list = [x]
        for n, key in enumerate(['stage2', 'stage3', 'stage4'], start=1):
            cfg = self.extra[key]
            trans = getattr(self, f'transition{n}')
            is_id = self._trans_is_identity[n]
            x_list = []
            for i in range(cfg['num_branches']):
                if is_id[i]:
                    x_list.append(y_list[i])
                else:
                    # ref forward :521-543 feeds every non-None
                    # transition the LAST branch
                    x_list.append(trans[i](y_list[-1]))
            y_list = getattr(self, key)(x_list)
        return y_list
