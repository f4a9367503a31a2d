"""Non-local and related attention heads
(ref contracts: mmseg/models/decode_heads/{nl_head.py:49LoC,
gc_head.py:47LoC, dnl_head.py:131LoC})."""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .fcn_head import FCNHead
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class NLHead(BaseDecodeHead):
    """FCN + a non-local block on the mid feature (ref nl_head.py)."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_0')(x,
                                                               train=train)
        nl = SelfAttentionBlock(
            channels=max(self.channels // self.reduction, 1),
            out_channels=self.channels, matmul_norm=self.use_scale,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='nl_block')(out, out, train=train)
        out = out + nl
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_1')(
            jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)


@HEADS.register_module()
class GCHead(BaseDecodeHead):
    """Global-context head (ref gc_head.py): FCN + GC block."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: tuple = ('channel_add',)

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_0')(x,
                                                               train=train)
        # context modeling: attention-pooled global vector
        b, h, w, c = out.shape
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), dtype=out.dtype,
                           name='conv_mask')(out)
            mask = nn.softmax(mask.reshape(b, h * w, 1), axis=1)
            ctx = jnp.einsum('bnc,bn1->bc', out.reshape(b, h * w, c),
                             mask).reshape(b, 1, 1, c)
        else:
            ctx = jnp.mean(out, axis=(1, 2), keepdims=True)
        planes = max(int(c * self.ratio), 1)
        t = nn.Conv(planes, (1, 1), dtype=out.dtype,
                    name='channel_add_conv_0')(ctx)
        t = nn.LayerNorm(dtype=t.dtype, name='channel_add_ln')(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), dtype=out.dtype,
                    name='channel_add_conv_1')(t)
        out = out + t
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_1')(
            jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)


@HEADS.register_module()
class DNLHead(BaseDecodeHead):
    """Disentangled non-local head (ref dnl_head.py): whitened pairwise
    term + unary term."""
    reduction: int = 2
    use_scale: bool = True
    temperature: float = 0.05

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_0')(x,
                                                               train=train)
        b, h, w, c = out.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=out.dtype,
                        name='theta')(out).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=out.dtype,
                      name='phi')(out).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=out.dtype,
                    name='g')(out).reshape(b, h * w, inter)
        # whitening (the 'disentangled' part)
        theta = theta - theta.mean(axis=1, keepdims=True)
        phi = phi - phi.mean(axis=1, keepdims=True)
        sim = jnp.einsum('bqc,bkc->bqk', theta.astype(jnp.float32),
                         phi.astype(jnp.float32))
        if self.use_scale:
            sim = sim / (inter ** 0.5)
        pairwise = nn.softmax(sim, axis=-1)
        # unary term
        unary = nn.Conv(1, (1, 1), dtype=out.dtype,
                        name='conv_mask')(out).reshape(b, h * w, 1)
        unary = nn.softmax(unary.astype(jnp.float32) / self.temperature,
                           axis=1).transpose(0, 2, 1)
        attn = pairwise + unary
        y = jnp.einsum('bqk,bkc->bqc', attn,
                       g.astype(jnp.float32)).astype(out.dtype)
        y = nn.Conv(c, (1, 1), dtype=out.dtype,
                    name='conv_out')(y.reshape(b, h, w, inter))
        out = out + y
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_1')(
            jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)
