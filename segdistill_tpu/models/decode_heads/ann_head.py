"""Asymmetric Non-local Neural Network head
(ref contract: mmseg/models/decode_heads/ann_head.py, 245 LoC).

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
from .psp_head import adaptive_avg_pool


class PPMConcat(nn.Module):
    """Pyramid-pool kv to fixed grids and concat along positions."""
    pool_scales: tuple = (1, 3, 6, 8)

    def __call__(self, x):
        b = x.shape[0]
        feats = [adaptive_avg_pool(x, s).astype(x.dtype).reshape(
            b, -1, x.shape[-1]) for s in self.pool_scales]
        return jnp.concatenate(feats, axis=1)  # (B, sum(s^2), C)


class _PyramidAttention(nn.Module):
    """SelfAttentionBlock with pyramid-sampled key/value positions."""
    channels: int
    out_channels: int
    query_scales: tuple = (1,)
    key_pool_scales: tuple = (1, 3, 6, 8)
    norm_cfg: dict = None
    act_cfg: dict = None

    @nn.compact
    def __call__(self, query_feats, key_feats, train=False):
        # reuse SelfAttentionBlock by treating the pyramid positions as an
        # (N, 1) spatial map
        kv_map = PPMConcat(self.key_pool_scales)(key_feats)[:, :, None, :]
        out = SelfAttentionBlock(
            channels=self.channels, out_channels=self.out_channels,
            key_query_num_convs=1, value_out_num_convs=1, matmul_norm=True,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='attn')(query_feats, kv_map, train=train)
        return out


@HEADS.register_module()
class ANNHead(BaseDecodeHead):
    input_transform: str = 'multiple_select'
    project_channels: int = 256
    query_scales: tuple = (1,)
    key_pool_scales: tuple = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, inputs, train=False):
        low, high = self._transform_inputs(inputs)
        # AFNB: fuse low into high
        ctx = _PyramidAttention(
            channels=self.project_channels, out_channels=high.shape[-1],
            key_pool_scales=self.key_pool_scales, norm_cfg=self.norm_cfg,
            act_cfg=None, name='fusion')(high, low, train=train)
        out = ctx + high
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='bottleneck')(out, train=train)
        # APNB: self attention with pyramid kv
        ctx2 = _PyramidAttention(
            channels=self.project_channels, out_channels=self.channels,
            key_pool_scales=self.key_pool_scales, norm_cfg=self.norm_cfg,
            act_cfg=None, name='context')(out, out, train=train)
        out = jnp.concatenate([ctx2, out], axis=-1)
        out = ConvModule(out_channels=self.channels, kernel_size=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='proj')(out, train=train)
        return self.cls_seg(out, train=train)
