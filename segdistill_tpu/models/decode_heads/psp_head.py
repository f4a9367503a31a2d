"""PSPHead with Pyramid Pooling Module
(ref contract: mmseg/models/decode_heads/psp_head.py:10-101).

torch ``AdaptiveAvgPool2d(s)`` becomes static mean-pool reshapes — output
bins are computed with the same floor/ceil bin edges torch uses, expressed as
a dense averaging matrix (MXU-friendly, static shapes).
"""

import functools

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


@functools.lru_cache(maxsize=128)
def _adaptive_pool_matrix(in_size, out_size):
    """(out_size, in_size) row-stochastic matrix = AdaptiveAvgPool1d."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = -(-((o + 1) * in_size) // out_size)  # ceil
        mat[o, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool(x, output_size):
    """NHWC adaptive average pooling with torch bin semantics."""
    oh, ow = (output_size, output_size) if isinstance(output_size, int) \
        else output_size
    mh = jnp.asarray(_adaptive_pool_matrix(x.shape[1], oh))
    mw = jnp.asarray(_adaptive_pool_matrix(x.shape[2], ow))
    x = jnp.einsum('oh,bhwc->bowc', mh, x.astype(jnp.float32))
    x = jnp.einsum('ow,bhwc->bhoc', mw, x)
    return x


class PPM(nn.Module):
    """Pyramid pooling module (ref: psp_head.py:10-63)."""
    pool_scales: tuple
    channels: int
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        outs = []
        for i, scale in enumerate(self.pool_scales):
            out = adaptive_avg_pool(x, scale).astype(x.dtype)
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name=f'pool_{i}')(out, train=train)
            out = resize(out, size=x.shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            outs.append(out)
        return outs


@HEADS.register_module()
class PSPHead(BaseDecodeHead):
    pool_scales: tuple = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        psp_outs = [x] + PPM(self.pool_scales, self.channels,
                             conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg,
                             align_corners=self.align_corners,
                             name='psp_modules')(x, train=train)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(psp_outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
