"""APCNet / DMNet heads
(ref contracts: mmseg/models/decode_heads/{apc_head.py:158LoC,
dm_head.py:140LoC})."""

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead
from .psp_head import adaptive_avg_pool


class ACM(nn.Module):
    """Adaptive Context Module: affinity between pixels and pooled-grid
    context vectors (ref apc_head.py:10-80)."""
    pool_scale: int
    channels: int
    fusion: bool = True
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, _ = x.shape
        s = self.pool_scale
        pooled = adaptive_avg_pool(x, s).astype(x.dtype)
        pooled = ConvModule(out_channels=self.channels, kernel_size=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='pooled_proj')(pooled, train=train)
        query = ConvModule(out_channels=self.channels, kernel_size=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='query_proj')(x, train=train)
        # affinity map: (B, HW, s*s), softmax over grid cells
        qf = query.reshape(b, h * w, self.channels).astype(jnp.float32)
        affinity = nn.Dense(s * s, dtype=x.dtype,
                            name='affinity')(query).reshape(b, h * w,
                                                            s * s)
        affinity = nn.softmax(affinity.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum('bns,bsc->bnc', affinity,
                         pooled.reshape(b, s * s,
                                        self.channels).astype(jnp.float32))
        ctx = ctx.reshape(b, h, w, self.channels).astype(x.dtype)
        if self.fusion:
            ctx = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='fusion_conv')(ctx, train=train)
        return ctx


@HEADS.register_module()
class APCHead(BaseDecodeHead):
    pool_scales: tuple = (1, 2, 3, 6)
    fusion: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            outs.append(ACM(pool_scale=s, channels=self.channels,
                            fusion=self.fusion, norm_cfg=self.norm_cfg,
                            act_cfg=self.act_cfg,
                            name=f'acm_{i}')(x, train=train))
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)


class DCM(nn.Module):
    """Dynamic Convolution Module: per-image filters from pooled context
    (ref dm_head.py:10-74). The dynamic conv = correlation of the feature
    map with the (s x s) pooled filter, depthwise per channel."""
    filter_size: int
    channels: int
    fusion: bool = True
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        s = self.filter_size
        filt = adaptive_avg_pool(x, s).astype(x.dtype)  # (B, s, s, C)
        feat = ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='input_proj')(x, train=train)
        filt = ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='filter_proj')(filt, train=train)
        pad = (s - 1) // 2
        pad_hi = s - 1 - pad
        fp = jnp.pad(feat, ((0, 0), (pad, pad_hi), (pad, pad_hi), (0, 0)))
        # depthwise dynamic conv via explicit shift-and-accumulate
        out = jnp.zeros_like(feat)
        for di in range(s):
            for dj in range(s):
                patch = fp[:, di:di + feat.shape[1],
                           dj:dj + feat.shape[2]]
                out = out + patch * filt[:, di:di + 1, dj:dj + 1]
        if self.fusion:
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='fusion_conv')(out, train=train)
        return out


@HEADS.register_module()
class DMHead(BaseDecodeHead):
    filter_sizes: tuple = (1, 3, 5, 7)
    fusion: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        outs = [x]
        for i, s in enumerate(self.filter_sizes):
            outs.append(DCM(filter_size=s, channels=self.channels,
                            fusion=self.fusion, norm_cfg=self.norm_cfg,
                            act_cfg=self.act_cfg,
                            name=f'dcm_{i}')(x, train=train))
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
