"""OCR head + cascade base
(ref contracts: mmseg/models/decode_heads/ocr_head.py:127LoC and
cascade_decode_head.py:57LoC).

Cascade heads take the previous stage's logits as additional input; used by
:class:`CascadeEncoderDecoder`.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..builder import HEADS
from ..utils import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class BaseCascadeDecodeHead(BaseDecodeHead):
    """Marker base: __call__(inputs, prev_output, train)."""
    is_cascade = True


@HEADS.register_module()
class OCRHead(BaseCascadeDecodeHead):
    """Object-contextual representations: soft object regions from the
    previous stage gather per-class context; object attention refines."""
    ocr_channels: int = 256
    scale: int = 1

    @nn.compact
    def __call__(self, inputs, prev_output, train=False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(out_channels=self.channels, kernel_size=3,
                           padding=1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg,
                           name='bottleneck')(x, train=train)

        # spatial gather: class-probability-weighted feature centroids
        b, h, w, c = feats.shape
        probs = nn.softmax(
            self.scale
            * prev_output.reshape(b, -1, prev_output.shape[-1]).astype(
                jnp.float32), axis=1)  # (B, N, K) over pixels (ref :32)
        ctx = jnp.einsum('bnk,bnc->bkc', probs,
                         feats.reshape(b, -1, c).astype(jnp.float32))
        ctx = ctx[:, None].astype(feats.dtype)  # (B, 1, K, C)

        refined = SelfAttentionBlock(
            channels=self.ocr_channels, out_channels=self.channels,
            key_query_num_convs=2, key_query_norm=True,
            value_out_num_convs=1, value_out_norm=True, matmul_norm=True,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='object_attention')(feats, ctx, train=train)
        out = ConvModule(out_channels=self.channels, kernel_size=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='conv_bn')(
            jnp.concatenate([refined, feats], axis=-1), train=train)
        return self.cls_seg(out, train=train)
