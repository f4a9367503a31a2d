"""EncoderDecoder segmentor
(ref contract: mmseg/models/segmentors/encoder_decoder.py).

Split TPU-first into:

* :class:`EncoderDecoderNet` — the flax compute graph
  (backbone -> neck -> heads), returning a dict of head logits; feature taps
  ride the 'feats' collection.
* :class:`EncoderDecoder` — a plain-python wrapper owning the net plus the
  *pure* loss/inference functions (all safe under jit; variables passed
  explicitly). ``slide_inference`` keeps the reference's overlap-window
  count-matrix averaging (encoder_decoder.py:169-212) with a static window
  grid so one compilation serves every image of a padded bucket size.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.utils import add_prefix
from ...ops import resize
from .. import builder
from ..builder import SEGMENTORS
from .base import BaseSegmentor, flatten_feats


class EncoderDecoderNet(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module
    neck: nn.Module = None
    auxiliary_head: Any = None  # single module or tuple of modules

    def extract_feat(self, img, train=False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    @nn.compact
    def __call__(self, img, train=False, with_aux=False):
        x = self.extract_feat(img, train=train)
        outs = {'decode': self.decode_head(x, train=train)}
        if with_aux and self.auxiliary_head is not None:
            aux = self.auxiliary_head
            if isinstance(aux, (list, tuple)):
                for i, h in enumerate(aux):
                    outs[f'aux_{i}'] = h(x, train=train)
            else:
                outs['aux'] = aux(x, train=train)
        return outs


@SEGMENTORS.register_module()
class EncoderDecoder(BaseSegmentor):

    def __init__(self, backbone, decode_head, neck=None, auxiliary_head=None,
                 train_cfg=None, test_cfg=None, pretrained=None, dtype=None):
        self.backbone_cfg = backbone
        self.decode_head_cfg = decode_head
        self.neck_cfg = neck
        self.auxiliary_head_cfg = auxiliary_head
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or {}

        backbone_cfg = dict(backbone)
        self.pretrained = pretrained or backbone_cfg.pop('pretrained', None)
        if dtype is not None:
            backbone_cfg.setdefault('dtype', dtype)
        self.backbone = builder.build_backbone(backbone_cfg)
        self.neck = builder.build_neck(neck) if neck is not None else None
        self.decode_head = builder.build_head(decode_head)
        self.align_corners = self.decode_head.align_corners
        self.num_classes = self.decode_head.num_classes
        if auxiliary_head is not None:
            if isinstance(auxiliary_head, (list, tuple)):
                self.auxiliary_head = tuple(
                    builder.build_head(c) for c in auxiliary_head)
            else:
                self.auxiliary_head = builder.build_head(auxiliary_head)
        else:
            self.auxiliary_head = None

        self.net = EncoderDecoderNet(
            backbone=self.backbone, decode_head=self.decode_head,
            neck=self.neck, auxiliary_head=self.auxiliary_head)

    # ------------------------------------------------------------------ init
    def init_variables(self, rng, input_shape=(1, 512, 512, 3)):
        img = jnp.zeros(input_shape, jnp.float32)
        # jit the init: eager per-op dispatch of a whole transformer init is
        # minutes on CPU; one compiled program is seconds
        init_fn = jax.jit(
            lambda rng, img: self.net.init({'params': rng}, img,
                                           train=False, with_aux=True))
        variables = dict(init_fn(rng, img))
        variables.pop('feats', None)  # taps are captured per-apply, not state
        return variables

    # ------------------------------------------------------------- training
    def forward_train(self, variables, img, gt, rngs=None,
                      capture_feats=False):
        """Pure fn: -> (loss dict w/ decode./aux. prefixes, feats,
        new model state). The reference counterpart is
        encoder_decoder.py:136-166."""
        mutable = ['batch_stats']
        if capture_feats:
            mutable.append('feats')
        outs, updated = self.net.apply(
            variables, img, train=True, with_aux=True,
            rngs=rngs or {}, mutable=mutable)
        losses = {}
        losses.update(add_prefix(
            self.decode_head.losses(outs['decode'], gt), 'decode'))
        if self.auxiliary_head is not None:
            if isinstance(self.auxiliary_head, tuple):
                for i, h in enumerate(self.auxiliary_head):
                    losses.update(add_prefix(
                        h.losses(outs[f'aux_{i}'], gt), f'aux_{i}'))
            else:
                losses.update(add_prefix(
                    self.auxiliary_head.losses(outs['aux'], gt), 'aux'))
        feats = flatten_feats(updated.get('feats', {})) if capture_feats \
            else {}
        return losses, feats, {'batch_stats': updated.get('batch_stats', {})}

    def forward_feats(self, variables, img, train=False, rngs=None):
        """Run the net capturing feature taps only (teacher path)."""
        _, updated = self.net.apply(
            variables, img, train=train, with_aux=False, rngs=rngs or {},
            mutable=['feats'] + (['batch_stats'] if train else []))
        return flatten_feats(updated.get('feats', {}))

    # ------------------------------------------------------------ inference
    def encode_decode(self, variables, img, train=False):
        """Logits resized to input resolution (ref :84-94)."""
        outs = self.net.apply(variables, img, train=False, with_aux=False)
        out = outs['decode']
        if isinstance(out, tuple):
            # multi-output heads (DAHead pam_cam/pam/cam, EncHead se):
            # inference uses the primary logits (ref da_head.py:160-162,
            # enc_head.py forward_test)
            out = out[0]
        return resize(out.astype(jnp.float32),
                      size=img.shape[1:3], mode='bilinear',
                      align_corners=self.align_corners)

    def whole_inference(self, variables, img, ori_shape=None, rescale=False):
        seg_logit = self.encode_decode(variables, img)
        if rescale and ori_shape is not None \
                and tuple(ori_shape[:2]) != tuple(img.shape[1:3]):
            seg_logit = resize(seg_logit, size=ori_shape[:2],
                               mode='bilinear',
                               align_corners=self.align_corners,
                               warning=False)
        return seg_logit

    def slide_inference(self, variables, img, ori_shape=None, rescale=False):
        """Overlap-window inference with count-matrix averaging
        (ref :169-212). Static python grid -> one XLA program."""
        h_stride, w_stride = self.test_cfg['stride']
        h_crop, w_crop = self.test_cfg['crop_size']
        B, h_img, w_img, _ = img.shape
        num_classes = self.num_classes
        h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
        w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
        preds = jnp.zeros((B, h_img, w_img, num_classes), jnp.float32)
        count = jnp.zeros((1, h_img, w_img, 1), jnp.float32)
        for hi in range(h_grids):
            for wi in range(w_grids):
                y1 = min(hi * h_stride, max(h_img - h_crop, 0))
                x1 = min(wi * w_stride, max(w_img - w_crop, 0))
                y2 = min(y1 + h_crop, h_img)
                x2 = min(x1 + w_crop, w_img)
                crop = img[:, y1:y2, x1:x2]
                logit = self.encode_decode(variables, crop)
                preds = preds.at[:, y1:y2, x1:x2].add(logit)
                count = count.at[:, y1:y2, x1:x2].add(1.0)
        preds = preds / count
        if rescale and ori_shape is not None \
                and tuple(ori_shape[:2]) != (h_img, w_img):
            preds = resize(preds, size=ori_shape[:2], mode='bilinear',
                           align_corners=self.align_corners, warning=False)
        return preds

    def inference(self, variables, img, ori_shape=None, rescale=False,
                  flip=False, flip_direction='horizontal'):
        """softmax probs with flip undone (ref :228-261)."""
        mode = self.test_cfg.get('mode', 'whole')
        if mode == 'slide':
            seg_logit = self.slide_inference(variables, img, ori_shape,
                                             rescale)
        else:
            seg_logit = self.whole_inference(variables, img, ori_shape,
                                             rescale)
        output = jax.nn.softmax(seg_logit, axis=-1)
        if flip:
            axis = 2 if flip_direction == 'horizontal' else 1
            output = jnp.flip(output, axis=axis)
        return output

    def simple_test(self, variables, img, ori_shape=None, rescale=True,
                    flip=False, flip_direction='horizontal'):
        probs = self.inference(variables, img, ori_shape, rescale, flip,
                               flip_direction)
        return jnp.argmax(probs, axis=-1)

    def aug_test(self, variables, imgs, metas, rescale=True):
        """TTA: average softmax probs over augmented views (ref :263-293)."""
        assert rescale
        acc = None
        for img, meta in zip(imgs, metas):
            probs = self.inference(
                variables, img, ori_shape=meta.get('ori_shape'),
                rescale=True, flip=meta.get('flip', False),
                flip_direction=meta.get('flip_direction', 'horizontal'))
            acc = probs if acc is None else acc + probs
        acc = acc / len(imgs)
        return jnp.argmax(acc, axis=-1)
