"""Torch twins of CCHead / PSAHead for checkpoint round-trip parity.

Both reference heads delegate their core op to compiled mmcv CUDA
kernels with no Python source in the reference tree:

* CCHead (ref mmseg/models/decode_heads/cc_head.py:13-41) uses
  ``mmcv.ops.CrissCrossAttention``. The attention math here is the
  documented equivalent pure-torch form (row + column joint softmax
  with the self position counted once via a -inf diagonal on the
  column branch; zero-init ``gamma`` residual of torch shape (1,)).
* PSAHead (ref psa_head.py:18-196) uses ``mmcv.ops.PSAMask``;
  ``psa_mask_torch`` implements the kernel's scatter semantics with
  explicit loops (test-sized inputs only).

State-dict layouts match the reference modules exactly (``cca.query_conv``,
``attention.0/.1`` Sequential slots, ``reduce_p``/``attention_p``,
``proj``/``bottleneck``/``conv_seg``) so the production converter's key
translation is exercised 1:1.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from .attn_heads import ConvModule


class CrissCrossAttention(nn.Module):
    """mmcv ops.CrissCrossAttention (pinned mmcv 1.2.2 layout: gamma is a
    bare (1,) Parameter)."""

    def __init__(self, channels):
        super().__init__()
        inter = max(channels // 8, 1)
        self.query_conv = nn.Conv2d(channels, inter, 1)
        self.key_conv = nn.Conv2d(channels, inter, 1)
        self.value_conv = nn.Conv2d(channels, channels, 1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, h, w = x.shape
        q, k, v = self.query_conv(x), self.key_conv(x), self.value_conv(x)
        energy_h = torch.einsum('bchw,bciw->bwhi', q, k)
        energy_h = energy_h + torch.diag(
            q.new_full((h,), float('-inf')))
        energy_h = energy_h.transpose(1, 2)            # (b, h, w, Hk)
        energy_w = torch.einsum('bchw,bchj->bhwj', q, k)
        attn = F.softmax(torch.cat([energy_h, energy_w], dim=-1), dim=-1)
        out = torch.einsum('bciw,bhwi->bchw', v, attn[..., :h])
        out = out + torch.einsum('bchj,bhwj->bchw', v, attn[..., h:])
        return self.gamma * out + x


class CCHead(nn.Module):
    """ref cc_head.py:13-41 — FCNHead(num_convs=2, concat_input=True)
    skeleton with ONE shared cca applied ``recurrence`` times."""

    def __init__(self, in_ch, channels, num_classes, recurrence=2,
                 in_index=0):
        super().__init__()
        self.in_index = in_index
        self.recurrence = recurrence
        self.convs = nn.ModuleList([
            ConvModule(in_ch, channels, 3, padding=1),
            ConvModule(channels, channels, 3, padding=1)])
        self.cca = CrissCrossAttention(channels)
        self.conv_cat = ConvModule(in_ch + channels, channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        out = self.convs[0](x)
        for _ in range(self.recurrence):
            out = self.cca(out)
        out = self.convs[1](out)
        out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)


def psa_mask_torch(y, mask_size, psa_type):
    """(n, mask_h*mask_w, h, w) -> (n, h*w, h, w) per the mmcv PSAMask
    kernel: collect scatters each source's relative window into absolute
    positions, distribute is the role-swapped transpose."""
    mask_h, mask_w = mask_size
    n, _, h, w = y.shape
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    out = y.new_zeros(n, h * w, h * w)
    for i in range(h):
        for j in range(w):
            for yy in range(h):
                for xx in range(w):
                    rh, rw = i - yy + half_h, j - xx + half_w
                    if 0 <= rh < mask_h and 0 <= rw < mask_w:
                        out[:, i * w + j, yy * w + xx] = \
                            y[:, rh * mask_w + rw, yy, xx]
    if psa_type == 'distribute':
        out = out.transpose(1, 2)
    return out.reshape(n, h * w, h, w)


def _resize(x, size, align_corners):
    return F.interpolate(x, size=size, mode='bilinear',
                         align_corners=align_corners)


class PSAHead(nn.Module):
    """ref psa_head.py:18-196, bi-direction or single-direction."""

    def __init__(self, in_ch, channels, num_classes, mask_size,
                 psa_type='bi-direction', compact=False, shrink_factor=2,
                 normalization_factor=1.0, psa_softmax=True, in_index=0,
                 align_corners=False):
        super().__init__()
        self.in_index = in_index
        self.psa_type = psa_type
        self.compact = compact
        self.shrink_factor = shrink_factor
        self.mask_size = mask_size
        mask_h, mask_w = mask_size
        self.psa_softmax = psa_softmax
        self.normalization_factor = normalization_factor
        self.align_corners = align_corners

        self.reduce = ConvModule(in_ch, channels, 1)
        self.attention = nn.Sequential(
            ConvModule(channels, channels, 1),
            nn.Conv2d(channels, mask_h * mask_w, 1, bias=False))
        if psa_type == 'bi-direction':
            self.reduce_p = ConvModule(in_ch, channels, 1)
            self.attention_p = nn.Sequential(
                ConvModule(channels, channels, 1),
                nn.Conv2d(channels, mask_h * mask_w, 1, bias=False))
        self.proj = ConvModule(
            channels * (2 if psa_type == 'bi-direction' else 1), in_ch, 1,
            padding=1)
        self.bottleneck = ConvModule(in_ch * 2, channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def _shrink(self, out, align_corners):
        n, c, h, w = out.shape
        if self.shrink_factor != 1:
            if h % self.shrink_factor and w % self.shrink_factor:
                h = (h - 1) // self.shrink_factor + 1
                w = (w - 1) // self.shrink_factor + 1
                align_corners = True
            else:
                h = h // self.shrink_factor
                w = w // self.shrink_factor
                align_corners = False
            out = _resize(out, (h, w), align_corners)
        return out, align_corners

    def forward(self, inputs):
        x = inputs[self.in_index]
        identity = x
        align_corners = self.align_corners
        if self.psa_type in ('collect', 'distribute'):
            out = self.reduce(x)
            out, align_corners = self._shrink(out, align_corners)
            n, c, h, w = out.shape
            y = self.attention(out)
            if self.compact:
                if self.psa_type == 'collect':
                    y = y.view(n, h * w, h * w).transpose(1, 2).view(
                        n, h * w, h, w)
            else:
                y = psa_mask_torch(y, self.mask_size, self.psa_type)
            if self.psa_softmax:
                y = F.softmax(y, dim=1)
            out = torch.bmm(
                out.view(n, c, h * w), y.view(n, h * w, h * w)).view(
                    n, c, h, w) * (1.0 / self.normalization_factor)
        else:
            x_col = self.reduce(x)
            x_dis = self.reduce_p(x)
            x_col, align_corners = self._shrink(x_col, align_corners)
            x_dis, _ = self._shrink(x_dis, self.align_corners)
            n, c, h, w = x_col.shape
            y_col = self.attention(x_col)
            y_dis = self.attention_p(x_dis)
            if self.compact:
                y_dis = y_dis.view(n, h * w, h * w).transpose(1, 2).view(
                    n, h * w, h, w)
            else:
                y_col = psa_mask_torch(y_col, self.mask_size, 'collect')
                y_dis = psa_mask_torch(y_dis, self.mask_size, 'distribute')
            if self.psa_softmax:
                y_col = F.softmax(y_col, dim=1)
                y_dis = F.softmax(y_dis, dim=1)
            x_col = torch.bmm(
                x_col.view(n, c, h * w), y_col.view(n, h * w, h * w)).view(
                    n, c, h, w) * (1.0 / self.normalization_factor)
            x_dis = torch.bmm(
                x_dis.view(n, c, h * w), y_dis.view(n, h * w, h * w)).view(
                    n, c, h, w) * (1.0 / self.normalization_factor)
            out = torch.cat([x_col, x_dis], 1)
        out = self.proj(out)
        out = _resize(out, identity.shape[2:], align_corners)
        out = self.bottleneck(torch.cat((identity, out), dim=1))
        return self.conv_seg(out)
