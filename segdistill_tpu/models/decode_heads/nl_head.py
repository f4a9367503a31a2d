"""Non-local and related attention heads
(ref contracts: mmseg/models/decode_heads/{nl_head.py:49LoC,
gc_head.py:47LoC, dnl_head.py:131LoC} + mmcv NonLocal2d / ContextBlock).

All three are FCNHead(num_convs=2) variants: convs_0 -> block ->
convs_1 -> conv_cat(cat[x, out]) -> cls_seg (ref nl_head.py:41-49).
"""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


class NonLocal2d(nn.Module):
    """mmcv.cnn.NonLocal2d (embedded_gaussian / dot_product): bare-bias
    1x1 g/theta/phi projections, normed act-free conv_out, residual
    inside the block."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
    norm_cfg: dict = None

    def _pairwise(self, theta, phi, inter):
        sim = jnp.einsum('bqc,bkc->bqk', theta.astype(jnp.float32),
                         phi.astype(jnp.float32))
        if self.mode == 'embedded_gaussian':
            if self.use_scale:
                sim = sim / (inter ** 0.5)
            return nn.softmax(sim, axis=-1)
        if self.mode == 'dot_product':
            return sim / sim.shape[-1]
        raise NotImplementedError(f'NonLocal2d mode {self.mode}')

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        g = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                       name='g')(x, train=train).reshape(b, h * w, inter)
        theta = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                           name='theta')(x, train=train).reshape(
                               b, h * w, inter)
        phi = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                         name='phi')(x, train=train).reshape(
                             b, h * w, inter)
        attn = self._pairwise(theta, phi, inter)
        y = jnp.einsum('bqk,bkc->bqc', attn,
                       g.astype(jnp.float32)).astype(x.dtype)
        y = ConvModule(out_channels=c, kernel_size=1,
                       norm_cfg=self.norm_cfg, act_cfg=None,
                       name='conv_out')(y.reshape(b, h, w, inter),
                                        train=train)
        return x + y


class DisentangledNonLocal2d(nn.Module):
    """ref dnl_head.py:9-83: whitened theta/phi, temperature on the
    pairwise logits, softmax-pooled unary context added to y before
    conv_out."""
    reduction: int = 2
    use_scale: bool = True
    temperature: float = 0.05
    norm_cfg: dict = None

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        g = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                       name='g')(x, train=train).reshape(b, h * w, inter)
        theta = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                           name='theta')(x, train=train).reshape(
                               b, h * w, inter)
        phi = ConvModule(out_channels=inter, kernel_size=1, act_cfg=None,
                         name='phi')(x, train=train).reshape(
                             b, h * w, inter)
        # whitening over positions (the 'disentangled' part, ref :57-58)
        theta = theta - theta.mean(axis=1, keepdims=True)
        phi = phi - phi.mean(axis=1, keepdims=True)
        sim = jnp.einsum('bqc,bkc->bqk', theta.astype(jnp.float32),
                         phi.astype(jnp.float32))
        if self.use_scale:
            sim = sim / (inter ** 0.5)
        pairwise = nn.softmax(sim / self.temperature, axis=-1)
        y = jnp.einsum('bqk,bkc->bqc', pairwise, g.astype(jnp.float32))
        # unary context: plain softmax over positions pooling g (ref
        # :71-79); broadcast-added to every position before conv_out
        unary = nn.Conv(1, (1, 1), dtype=x.dtype,
                        name='conv_mask')(x).reshape(b, h * w, 1)
        unary = nn.softmax(unary.astype(jnp.float32), axis=1)
        unary_x = jnp.einsum('bn1,bnc->bc', unary, g.astype(jnp.float32))
        y = (y + unary_x[:, None]).astype(x.dtype)
        y = ConvModule(out_channels=c, kernel_size=1,
                       norm_cfg=self.norm_cfg, act_cfg=None,
                       name='conv_out')(y.reshape(b, h, w, inter),
                                        train=train)
        return x + y


class ContextBlock(nn.Module):
    """mmcv.cnn.ContextBlock: attention-pooled (or avg) global context
    through a conv/LN/ReLU/conv transform, channel_add / channel_mul
    fusion."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: tuple = ('channel_add',)

    def _transform(self, ctx, c, planes, name):
        t = nn.Conv(planes, (1, 1), dtype=ctx.dtype,
                    name=f'{name}_0')(ctx)
        t = nn.LayerNorm(dtype=t.dtype, name=f'{name}_1')(t)
        t = nn.relu(t)
        return nn.Conv(c, (1, 1), dtype=ctx.dtype, name=f'{name}_3')(t)

    @nn.compact
    def __call__(self, x, train=False):
        del train
        b, h, w, c = x.shape
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), dtype=x.dtype, name='conv_mask')(x)
            mask = nn.softmax(mask.reshape(b, h * w, 1).astype(
                jnp.float32), axis=1)
            ctx = jnp.einsum('bnc,bn1->bc', x.reshape(
                b, h * w, c).astype(jnp.float32), mask)
            ctx = ctx.reshape(b, 1, 1, c).astype(x.dtype)
        else:
            ctx = jnp.mean(x, axis=(1, 2), keepdims=True)
        planes = max(int(c * self.ratio), 1)
        out = x
        if 'channel_mul' in self.fusion_types:
            out = out * nn.sigmoid(self._transform(ctx, c, planes,
                                                   'channel_mul_conv'))
        if 'channel_add' in self.fusion_types:
            out = out + self._transform(ctx, c, planes, 'channel_add_conv')
        return out


class _FCNAttnHead(BaseDecodeHead):
    """Shared FCNHead(num_convs=2) skeleton (ref nl_head.py:41-49)."""
    concat_input: bool = True

    def _block(self, out, train):
        raise NotImplementedError

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_0')(x,
                                                               train=train)
        out = self._block(out, train)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_1')(out,
                                                               train=train)
        if self.concat_input:
            out = ConvModule(out_channels=self.channels, kernel_size=3,
                             padding=1, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg, name='conv_cat')(
                jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)


@HEADS.register_module()
class NLHead(_FCNAttnHead):
    """FCN + a non-local block between the convs (ref nl_head.py)."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'

    def _block(self, out, train):
        return NonLocal2d(reduction=self.reduction,
                          use_scale=self.use_scale, mode=self.mode,
                          norm_cfg=self.norm_cfg,
                          name='nl_block')(out, train=train)


@HEADS.register_module()
class GCHead(_FCNAttnHead):
    """FCN + global-context block (ref gc_head.py)."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: tuple = ('channel_add',)

    def _block(self, out, train):
        return ContextBlock(ratio=self.ratio,
                            pooling_type=self.pooling_type,
                            fusion_types=tuple(self.fusion_types),
                            name='gc_block')(out, train=train)


@HEADS.register_module()
class DNLHead(_FCNAttnHead):
    """FCN + disentangled non-local block (ref dnl_head.py).

    ``mode`` is accepted for config parity (ref _base_/models/dnl_r50-d8.py
    passes it); the disentangled block is defined for 'embedded_gaussian'
    only, matching the reference's only shipped configuration.
    """
    reduction: int = 2
    use_scale: bool = True
    temperature: float = 0.05
    mode: str = 'embedded_gaussian'

    def __post_init__(self):
        if self.mode != 'embedded_gaussian':
            raise ValueError(
                f'DNLHead supports mode="embedded_gaussian", got {self.mode}')
        super().__post_init__()

    def _block(self, out, train):
        return DisentangledNonLocal2d(
            reduction=self.reduction, use_scale=self.use_scale,
            temperature=self.temperature, norm_cfg=self.norm_cfg,
            name='dnl_block')(out, train=train)
