"""BaseDecodeHead (ref contract: mmseg/models/decode_heads/decode_head.py:14-237).

Heads are Flax modules producing NHWC logits; ``losses()`` is a pure function
of (logits, labels) so it lives inside the jitted train step. The 1x1
classifier conv ('conv_seg' / 'linear_pred') sows its output as a distillation
tap under the reference's hookable layer name.

Loss semantics preserved exactly (fp32 islands — ref ``@force_fp32``,
decode_head.py:217): logits resized to label size (bilinear,
align_corners per head), per-pixel CE with 0 at ignore, averaged over ALL
pixels; ``acc_seg`` in percent over all pixels.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import build_loss
from ..losses import accuracy
from ..utils import NormLayer


class BaseDecodeHead(nn.Module):
    in_channels: Any = None
    channels: int = None
    num_classes: int = 19
    dropout_ratio: float = 0.1
    conv_cfg: dict = None
    norm_cfg: dict = None
    # 'default' sentinel -> ReLU (ref decode_head.py:71 act_cfg=dict(
    # type='ReLU')); an explicit None from config means no activation
    # (mmcv ConvModule contract). Forwarded verbatim to ConvModule.
    act_cfg: object = 'default'
    in_index: Any = -1
    input_transform: str = None
    loss_decode: dict = None
    decoder_params: dict = None
    ignore_index: int = 255
    sampler: dict = None
    align_corners: bool = False

    # default loss; SegFormerHead overrides (reduction='none')
    DEFAULT_LOSS = dict(type='CrossEntropyLoss', use_sigmoid=False,
                        loss_weight=1.0)

    def _loss_cfg(self):
        return dict(self.loss_decode or self.DEFAULT_LOSS)

    def _transform_inputs(self, inputs):
        """resize_concat / multiple_select / single-index
        (ref: decode_head.py:139-164), NHWC."""
        if self.input_transform == 'resize_concat':
            sel = [inputs[i] for i in self.in_index]
            ups = [resize(x, size=sel[0].shape[1:3], mode='bilinear',
                          align_corners=self.align_corners) for x in sel]
            return jnp.concatenate(ups, axis=-1)
        if self.input_transform == 'multiple_select':
            return [inputs[i] for i in self.in_index]
        return inputs[self.in_index]

    def cls_seg(self, feat, train=False):
        """Per-pixel classifier (ref: decode_head.py:210-215). Tap name
        'conv_seg' matches the reference hookable layer; the sown value is
        NHWC — the distillation engine converts to the reference's NCHW."""
        if self.dropout_ratio > 0:
            # torch nn.Dropout2d drops whole channels
            feat = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                              name='dropout')(feat, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=feat.dtype, name='conv_seg')(feat)
        self.sow('feats', 'conv_seg__tap', out)
        return out

    def _fused_ce_eligible(self, loss_cfg, seg_weight):
        return (loss_cfg.get('type') == 'CrossEntropyLoss'
                and not loss_cfg.get('use_sigmoid', False)
                and loss_cfg.get('class_weight') is None
                and seg_weight is None and self.sampler is None)

    def losses(self, seg_logit, seg_label, seg_weight=None):
        """(logits NHWC, labels (B,H,W)) -> {'loss_seg','acc_seg'}."""
        loss_cfg = self._loss_cfg()
        if self._fused_ce_eligible(loss_cfg, seg_weight):
            # fused upsample+CE Pallas kernel (ops/pallas/seg_ce.py):
            # avoids materializing the GT-resolution logits. Identical
            # value to resize->CE->mean-over-all-pixels.
            from ...ops.pallas import can_use_fused_ce, fused_seg_ce
            nchw_shape = (seg_logit.shape[0], seg_logit.shape[3],
                          seg_logit.shape[1], seg_logit.shape[2])
            out_hw = seg_label.shape[1:3]
            if can_use_fused_ce(nchw_shape, out_hw, self.align_corners):
                z = jnp.transpose(seg_logit, (0, 3, 1, 2))
                ce_sum, correct = fused_seg_ce(
                    z, seg_label, tuple(out_hw), self.num_classes,
                    self.ignore_index)
                total_px = seg_label.size
                lw = loss_cfg.get('loss_weight', 1.0)
                return {'loss_seg': lw * ce_sum / total_px,
                        'acc_seg': correct * (100.0 / total_px)}
        # >= fp32 (ref @force_fp32, decode_head.py:217); f64 under
        # jax_enable_x64 stays f64 for the x64 parity gates
        seg_logit = resize(
            seg_logit.astype(jnp.promote_types(seg_logit.dtype,
                                               jnp.float32)),
            size=seg_label.shape[1:3], mode='bilinear',
            align_corners=self.align_corners)
        if self.sampler is not None and seg_weight is None:
            # pixel sampler (OHEM) -> per-pixel weights
            # (ref decode_head.py:222-226)
            from ...core.seg import build_pixel_sampler
            sampler = build_pixel_sampler(dict(self.sampler), context=self)
            seg_weight = sampler.sample(seg_logit, seg_label)
        loss_fn = build_loss(self._loss_cfg())
        loss = dict()
        loss['loss_seg'] = loss_fn(seg_logit, seg_label, weight=seg_weight,
                                   ignore_index=self.ignore_index)
        loss['acc_seg'] = accuracy(seg_logit, seg_label)
        return loss
