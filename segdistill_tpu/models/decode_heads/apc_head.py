"""APCNet / DMNet heads
(ref contracts: mmseg/models/decode_heads/{apc_head.py:10-158,
dm_head.py:10-139})."""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule, NormLayer, build_activation
from .decode_head import BaseDecodeHead
from .psp_head import adaptive_avg_pool


class ACM(nn.Module):
    """Adaptive Context Module (ref apc_head.py:10-106): sigmoid-gated
    affinity between pixels and pooled-grid context vectors, with a
    global-info shortcut into the affinity conv and a residual back to
    the reduced input."""
    pool_scale: int
    channels: int
    fusion: bool = True
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, _ = x.shape
        s = self.pool_scale
        pooled = adaptive_avg_pool(x, s).astype(x.dtype)
        pooled = ConvModule(out_channels=self.channels, kernel_size=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='pooled_redu_conv')(pooled, train=train)
        xr = ConvModule(out_channels=self.channels, kernel_size=1,
                        norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                        name='input_redu_conv')(x, train=train)
        gi = ConvModule(out_channels=self.channels, kernel_size=1,
                        norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                        name='global_info')(
            jnp.mean(xr, axis=(1, 2), keepdims=True), train=train)
        affinity = nn.Conv(s * s, (1, 1), dtype=x.dtype,
                           name='gla')(xr + gi)  # broadcast global info
        affinity = nn.sigmoid(
            affinity.reshape(b, h * w, s * s).astype(jnp.float32))
        z = jnp.einsum('bns,bsc->bnc', affinity,
                       pooled.reshape(b, s * s,
                                      self.channels).astype(jnp.float32))
        z = z.reshape(b, h, w, self.channels).astype(x.dtype)
        z = ConvModule(out_channels=self.channels, kernel_size=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name='residual_conv')(z, train=train)
        z = nn.relu(z + xr)
        if self.fusion:
            z = ConvModule(out_channels=self.channels, kernel_size=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='fusion_conv')(z, train=train)
        return z


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
    """Dynamic Convolution Module (ref dm_head.py:10-88): a bare 1x1 conv
    generates per-image (filter_size x filter_size) depthwise filters from
    the pooled input; the reduced input is correlated with them, then
    norm + act (+ optional fusion conv)."""
    filter_size: int
    channels: int
    fusion: bool = False
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, x, train=False):
        s = self.filter_size
        filt = nn.Conv(self.channels, (1, 1), dtype=x.dtype,
                       name='filter_gen_conv')(
            adaptive_avg_pool(x, s).astype(x.dtype))  # (B, s, s, C)
        feat = ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='input_redu_conv')(x, train=train)
        pad = (s - 1) // 2
        # ref pads (pad+1, pad) for even s-1; configs use odd s only
        pad_lo = pad if (s - 1) % 2 == 0 else pad + 1
        fp = jnp.pad(feat, ((0, 0), (pad_lo, pad), (pad_lo, pad), (0, 0)))
        out = None
        for di in range(s):
            for dj in range(s):
                patch = fp[:, di:di + feat.shape[1],
                           dj:dj + feat.shape[2]]
                term = patch * filt[:, di:di + 1, dj:dj + 1]
                out = term if out is None else out + term
        if self.norm_cfg is not None:
            out = NormLayer(self.norm_cfg, name='norm')(out, train=train)
        act_cfg = dict(type='ReLU') if self.act_cfg == 'default' \
            else self.act_cfg
        out = build_activation(act_cfg)(out)
        if self.fusion:
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='fusion_conv')(out, train=train)
        return out


@HEADS.register_module()
class DMHead(BaseDecodeHead):
    filter_sizes: tuple = (1, 3, 5, 7)
    fusion: bool = False  # ref dm_head.py:105

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
