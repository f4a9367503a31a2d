"""CascadeEncoderDecoder: N-stage cascade of decode heads (OCRNet/PointRend)
(ref contract: mmseg/models/segmentors/cascade_encoder_decoder.py:98LoC)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...core.utils import add_prefix
from ...ops import resize
from .. import builder
from ..builder import SEGMENTORS
from .base import flatten_feats
from .encoder_decoder import EncoderDecoder


class CascadeNet(nn.Module):
    backbone: nn.Module
    decode_heads: tuple
    neck: nn.Module = None
    auxiliary_head: Any = None

    @nn.compact
    def __call__(self, img, train=False, with_aux=False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        outs = {}
        out = self.decode_heads[0](x, train=train)
        outs['decode_0'] = out
        for i, head in enumerate(self.decode_heads[1:], start=1):
            out = head(x, out, train=train)
            outs[f'decode_{i}'] = out
        outs['decode'] = out
        if with_aux and self.auxiliary_head is not None:
            aux = self.auxiliary_head
            if isinstance(aux, (list, tuple)):
                for i, h in enumerate(aux):
                    outs[f'aux_{i}'] = h(x, train=train)
            else:
                outs['aux'] = aux(x, train=train)
        return outs


@SEGMENTORS.register_module()
class CascadeEncoderDecoder(EncoderDecoder):

    def __init__(self, num_stages, backbone, decode_head, neck=None,
                 auxiliary_head=None, train_cfg=None, test_cfg=None,
                 pretrained=None):
        assert num_stages == len(decode_head)
        self.num_stages = num_stages
        # initialize like EncoderDecoder but with head list
        self.backbone_cfg = backbone
        self.decode_head_cfg = decode_head
        self.neck_cfg = neck
        self.auxiliary_head_cfg = auxiliary_head
        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or {}
        backbone_cfg = dict(backbone)
        self.pretrained = pretrained or backbone_cfg.pop('pretrained', None)
        self.backbone = builder.build_backbone(backbone_cfg)
        self.neck = builder.build_neck(neck) if neck is not None else None
        self.decode_head = tuple(builder.build_head(c) for c in decode_head)
        self.align_corners = self.decode_head[-1].align_corners
        self.num_classes = self.decode_head[-1].num_classes
        if auxiliary_head is not None:
            if isinstance(auxiliary_head, (list, tuple)):
                self.auxiliary_head = tuple(
                    builder.build_head(c) for c in auxiliary_head)
            else:
                self.auxiliary_head = builder.build_head(auxiliary_head)
        else:
            self.auxiliary_head = None
        self.net = CascadeNet(backbone=self.backbone,
                              decode_heads=self.decode_head,
                              neck=self.neck,
                              auxiliary_head=self.auxiliary_head)

    def forward_train(self, variables, img, gt, rngs=None,
                      capture_feats=False):
        mutable = ['batch_stats'] + (['feats'] if capture_feats else [])
        outs, updated = self.net.apply(variables, img, train=True,
                                       with_aux=True, rngs=rngs or {},
                                       mutable=mutable)
        losses = {}
        for i, head in enumerate(self.decode_head):
            losses.update(add_prefix(head.losses(outs[f'decode_{i}'], gt),
                                     f'decode_{i}'))
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
        return losses, feats, {'batch_stats': updated.get('batch_stats',
                                                          {})}

    def encode_decode(self, variables, img, train=False):
        outs = self.net.apply(variables, img, train=False, with_aux=False)
        return resize(outs['decode'].astype(jnp.float32),
                      size=img.shape[1:3], mode='bilinear',
                      align_corners=self.align_corners)
