"""Asymmetric Non-local Neural Network head
(ref contract: mmseg/models/decode_heads/ann_head.py:10-245).

AFNB (fusion of low+high level features through pyramid-sampled key/value
attention) followed by APNB (self attention with pyramid-sampled kv).
Pyramid sampling = adaptive-avg-pool of kv to (1,3,6,8) grids, concatenated
along the key axis — static shapes, MXU-friendly.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class _ANNAttention(nn.Module):
    """ref ann_head.py:32-77: SelfAttentionBlock with NORMED key/query
    ConvModule projections (head act), bare value/out convs, matmul_norm,
    and key/value pyramid-pooled AFTER projection."""
    channels: int
    out_channels: int
    share_key_query: bool = False
    key_pool_scales: tuple = (1, 3, 6, 8)
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, query_feats, key_feats, train=False):
        return SelfAttentionBlock(
            channels=self.channels, out_channels=self.out_channels,
            share_key_query=self.share_key_query,
            key_query_num_convs=1, key_query_norm=True,
            value_out_num_convs=1, value_out_norm=False, matmul_norm=True,
            key_pool_scales=tuple(self.key_pool_scales),
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='attn')(query_feats, key_feats, train=train)


class _AFNB(nn.Module):
    """ref ann_head.py:80-131: fusion block; bottleneck is a 1x1 on
    cat[context, high] with act=None."""
    channels: int
    out_channels: int
    query_scales: tuple = (1,)
    key_pool_scales: tuple = (1, 3, 6, 8)
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, low, high, train=False):
        ctx = None
        for i, qs in enumerate(self.query_scales):
            if qs != 1:
                raise NotImplementedError(
                    'query_scale > 1 breaks the reference reshape too '
                    '(ann_head.py:56-58 + self_attention_block.py:137)')
            out = _ANNAttention(
                channels=self.channels, out_channels=self.out_channels,
                share_key_query=False,
                key_pool_scales=self.key_pool_scales,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'stages_{i}')(high, low, train=train)
            ctx = out if ctx is None else ctx + out
        return ConvModule(out_channels=self.out_channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=None,
                          name='bottleneck')(
            jnp.concatenate([ctx, high], axis=-1), train=train)


class _APNB(nn.Module):
    """ref ann_head.py:134-181: self attention; shared key/query
    projection; bottleneck 1x1 on cat[context, feats] WITH act."""
    channels: int
    out_channels: int
    query_scales: tuple = (1,)
    key_pool_scales: tuple = (1, 3, 6, 8)
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, feats, train=False):
        ctx = None
        for i, qs in enumerate(self.query_scales):
            if qs != 1:
                raise NotImplementedError('query_scale > 1 unsupported')
            out = _ANNAttention(
                channels=self.channels, out_channels=self.out_channels,
                share_key_query=True,
                key_pool_scales=self.key_pool_scales,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'stages_{i}')(feats, feats, train=train)
            ctx = out if ctx is None else ctx + out
        return ConvModule(out_channels=self.out_channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='bottleneck')(
            jnp.concatenate([ctx, feats], axis=-1), train=train)


@HEADS.register_module()
class ANNHead(BaseDecodeHead):
    input_transform: str = 'multiple_select'
    project_channels: int = 256
    query_scales: tuple = (1,)
    key_pool_scales: tuple = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, inputs, train=False):
        low, high = self._transform_inputs(inputs)
        out = _AFNB(channels=self.project_channels,
                    out_channels=high.shape[-1],
                    query_scales=tuple(self.query_scales),
                    key_pool_scales=tuple(self.key_pool_scales),
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    name='fusion')(low, high, train=train)
        # ref applies the head dropout between fusion and bottleneck
        # (ann_head.py:239-241)
        if self.dropout_ratio > 0:
            # torch nn.Dropout2d: channel-wise drop (ref decode_head.py:85)
            out = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                             deterministic=not train,
                             name='fusion_dropout')(out)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='bottleneck')(out, train=train)
        out = _APNB(channels=self.project_channels,
                    out_channels=self.channels,
                    query_scales=tuple(self.query_scales),
                    key_pool_scales=tuple(self.key_pool_scales),
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    name='context')(out, train=train)
        return self.cls_seg(out, train=train)
