"""DANet / CCNet / EMANet / EncNet heads
(ref contracts: mmseg/models/decode_heads/{da_head.py:178LoC, cc_head.py:42,
ema_head.py:168, enc_head.py:187})."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import HEADS, build_loss
from ..utils import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class Scale(nn.Module):
    """mmcv.cnn.Scale: a learnable scalar (param name 'scale')."""
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        return x * self.param('scale', nn.initializers.constant(self.init),
                              ())


class PAM(SelfAttentionBlock):
    """Position attention module (ref da_head.py:12-46): a
    SelfAttentionBlock with bare-conv projections to ``channels``
    (= pam_channels — NOT further reduced), value/out at in_channels,
    no matmul norm, gamma-scaled residual."""

    @nn.compact
    def __call__(self, x, train=False):  # noqa: D401
        out = SelfAttentionBlock.__call__(self, x, x, train=train)
        return Scale(name='gamma')(out) + x


class CAM(nn.Module):
    """Channel attention module (ref da_head.py:49-72)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = x.reshape(b, h * w, c).astype(jnp.float32)
        energy = jnp.einsum('bnc,bnd->bcd', f, f)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum('bcd,bnd->bnc', attn, f).astype(x.dtype)
        return Scale(name='gamma')(out.reshape(b, h, w, c)) + x


@HEADS.register_module()
class DAHead(BaseDecodeHead):
    """Dual attention (ref da_head.py:75-178): parallel PAM/CAM branches,
    THREE outputs (pam_cam, pam, cam) each with its own conv_seg and its
    own CE loss; inference uses pam_cam only."""
    pam_channels: int = 64

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        pam = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='pam_in_conv')(x, train=train)
        pam = PAM(channels=self.pam_channels,
                  out_channels=self.channels, with_out=False,
                  matmul_norm=False, name='pam')(pam, train=train)
        pam = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='pam_out_conv')(pam, train=train)
        pam_out = self._aux_cls_seg(pam, 'pam_conv_seg', train)

        cam = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='cam_in_conv')(x, train=train)
        cam = CAM(name='cam')(cam)
        cam = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='cam_out_conv')(cam, train=train)
        cam_out = self._aux_cls_seg(cam, 'cam_conv_seg', train)

        pam_cam_out = self.cls_seg(pam + cam, train=train)
        return pam_cam_out, pam_out, cam_out

    def _aux_cls_seg(self, feat, name, train):
        """ref pam_cls_seg/cam_cls_seg: shared dropout rate, own conv."""
        if self.dropout_ratio > 0:
            # torch nn.Dropout2d drops whole channels (ref decode_head
            # dropout shared by pam/cam_cls_seg)
            feat = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                              deterministic=not train,
                              name=f'{name}_dropout')(feat)
        return nn.Conv(self.num_classes, (1, 1), dtype=feat.dtype,
                       name=name)(feat)

    def losses(self, seg_logit, seg_label, seg_weight=None):
        """ref da_head.py:164-178: three prefixed CE losses."""
        from ...core.utils import add_prefix
        pam_cam, pam, cam = seg_logit
        loss = {}
        loss.update(add_prefix(
            super().losses(pam_cam, seg_label, seg_weight), 'pam_cam'))
        loss.update(add_prefix(
            super().losses(pam, seg_label, seg_weight), 'pam'))
        loss.update(add_prefix(
            super().losses(cam, seg_label, seg_weight), 'cam'))
        return loss


class CrissCrossAttention(nn.Module):
    """mmcv ``ops.CrissCrossAttention`` equivalent (ref cc_head.py:6-30
    delegates to the compiled CUDA op; semantics per CCNet,
    arXiv:1811.11721): every pixel attends over its full row + column via
    a joint softmax with the self position counted ONCE (-inf on the
    column-branch diagonal), aggregated values blended residually through
    a zero-initialised scalar ``gamma`` (torch shape (1,), kept so the
    checkpoint converter maps it 1:1)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // 8, 1)
        q = nn.Conv(inter, (1, 1), dtype=x.dtype, name='query_conv')(x)
        k = nn.Conv(inter, (1, 1), dtype=x.dtype, name='key_conv')(x)
        v = nn.Conv(c, (1, 1), dtype=x.dtype, name='value_conv')(x)
        # row branch: each pixel scores its row (w keys)
        er = jnp.einsum('bhqc,bhkc->bhqk', q, k,
                        preferred_element_type=jnp.float32)
        # column branch: its column (h keys)
        ec = jnp.einsum('bqwc,bkwc->bwqk', q, k,
                        preferred_element_type=jnp.float32)
        ec_t = jnp.transpose(ec, (0, 2, 1, 3))  # (b, q=h, w, k=h)
        diag = jnp.eye(h, dtype=bool)[:, None, :]  # (q, 1, k)
        ec_t = jnp.where(diag[None], -1e9, ec_t)
        cat = jnp.concatenate([ec_t, er], axis=-1)  # (b, h, w, h + w)
        attn = nn.softmax(cat, axis=-1)
        a_col = attn[..., :h]
        a_row = attn[..., h:]
        vf = v.astype(jnp.float32)
        out = jnp.einsum('bqwk,bkwc->bqwc', a_col, vf)
        out = out + jnp.einsum('bhqk,bhkc->bhqc', a_row, vf)
        gamma = self.param('gamma', nn.initializers.zeros, (1,))
        return x + gamma[0] * out.astype(x.dtype)


@HEADS.register_module()
class CCHead(BaseDecodeHead):
    """Criss-cross attention head (ref cc_head.py:13-41): FCNHead
    skeleton with ONE CrissCrossAttention module applied ``recurrence``
    times between convs[0] and convs[1] — the attention weights are
    shared across recurrences — then conv_cat on cat([x, out])
    (FCNHead's concat_input default)."""
    recurrence: int = 2
    kernel_size: int = 3
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        out = ConvModule(out_channels=self.channels,
                         kernel_size=self.kernel_size,
                         padding=self.kernel_size // 2,
                         norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_0')(x,
                                                               train=train)
        cca = CrissCrossAttention(name='cca')
        for _ in range(self.recurrence):
            out = cca(out)
        out = ConvModule(out_channels=self.channels,
                         kernel_size=self.kernel_size,
                         padding=self.kernel_size // 2,
                         norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='convs_1')(out,
                                                               train=train)
        if self.concat_input:
            out = ConvModule(out_channels=self.channels,
                             kernel_size=self.kernel_size,
                             padding=self.kernel_size // 2,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='conv_cat')(
                jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)


class _FrozenInner(nn.Module):
    """Bare 1x1 conv params with stopped gradients."""
    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, in_ch, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = jax.lax.stop_gradient(kernel).astype(x.dtype)
        bias = jax.lax.stop_gradient(bias).astype(x.dtype)
        return jnp.einsum('bhwc,co->bhwo', x, kernel[0, 0]) + bias


class _FrozenConv1x1(nn.Module):
    """1x1 conv whose params receive no gradient (ref ema_head.py:124-131:
    ema_mid_conv params have requires_grad=False). Child named 'conv' so
    checkpoints map to ``...ema_mid_conv.conv.*``."""
    features: int

    @nn.compact
    def __call__(self, x):
        return _FrozenInner(self.features, name='conv')(x)


@HEADS.register_module()
class EMAHead(BaseDecodeHead):
    """Expectation-maximization attention (ref ema_head.py:19-168).

    Faithful semantics: the EM loop AND the reconstruction run without
    gradient (the ref computes recon from no-grad bases and the last
    in-loop attention, so only the identity path backpropagates to the
    backbone); ema_mid_conv is a frozen 1x1; the bases are a (1, C, K)
    non-trainable buffer (batch_stats) momentum-updated with the
    batch-mean bases during training (ref :69-74)."""
    ema_channels: int = 256
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
    concat_input: bool = True

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(out_channels=self.ema_channels, kernel_size=3,
                           padding=1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg,
                           name='ema_in_conv')(x, train=train)
        identity = feats
        feats = _FrozenConv1x1(self.ema_channels,
                               name='ema_mid_conv')(feats)
        b, h, w, c = feats.shape

        def init_bases(*_):
            k = self.make_rng('params') if self.has_rng('params') else \
                jax.random.PRNGKey(0)
            bases = jax.random.normal(k, (1, c, self.num_bases),
                                      jnp.float32) \
                * (2.0 / self.num_bases) ** 0.5
            return bases / jnp.maximum(
                jnp.linalg.norm(bases, axis=1, keepdims=True), 1e-12)

        bases_var = self.variable('batch_stats', 'ema_module_bases',
                                  init_bases)
        bases = jnp.broadcast_to(bases_var.value,
                                 (b, c, self.num_bases)).astype(jnp.float32)
        f = feats.reshape(b, h * w, c).astype(jnp.float32)

        def em_step(i, carry):
            bases, _ = carry
            attn = nn.softmax(jnp.einsum('bnc,bck->bnk', f, bases),
                              axis=2)
            attn_l1 = attn / jnp.maximum(
                jnp.sum(attn, axis=1, keepdims=True), 1e-12)
            bases = jnp.einsum('bnc,bnk->bck', f, attn_l1)
            bases = bases / jnp.maximum(
                jnp.linalg.norm(bases, axis=1, keepdims=True), 1e-12)
            return bases, attn

        attn0 = jnp.zeros((b, h * w, self.num_bases), jnp.float32)
        bases, attn = jax.lax.stop_gradient(jax.lax.fori_loop(
            0, self.num_stages, em_step, (bases, attn0)))
        # recon from the FINAL bases and the LAST in-loop (pre-l1)
        # attention, both detached (ref :63-65: the whole branch carries
        # no gradient back to feats)
        recon = jnp.einsum('bck,bnk->bnc', bases, attn).astype(feats.dtype)
        if train and not self.is_initializing():
            new = bases.mean(axis=0, keepdims=True)
            new = new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12)
            bases_var.value = (1 - self.momentum) * bases_var.value \
                + self.momentum * new
        recon = nn.relu(recon.reshape(b, h, w, c))
        recon = ConvModule(out_channels=self.ema_channels, kernel_size=1,
                           norm_cfg=self.norm_cfg, act_cfg=None,
                           name='ema_out_conv')(recon, train=train)
        out = nn.relu(identity + recon)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg,
                         name='bottleneck')(out, train=train)
        if self.concat_input:
            out = ConvModule(out_channels=self.channels, kernel_size=3,
                             padding=1, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg, name='conv_cat')(
                jnp.concatenate([x, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)


class _Encoding(nn.Module):
    """mmseg ops/encoding.py: learnable residual encoder. codewords
    (K, C) init U(-std, std) with std = 1/sqrt(K*C); scale (K,) init
    U(-1, 0) and multiplied AS-IS onto the squared distances (the
    negativity lives in the parameter, ref :17-43)."""
    num_codes: int

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C) -> (B, K, C) residual aggregation
        c = x.shape[-1]
        std = 1.0 / ((self.num_codes * c) ** 0.5)
        codewords = self.param(
            'codewords',
            lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -std, std),
            (self.num_codes, c))
        scale = self.param(
            'scale',
            lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -1.0, 0.0),
            (self.num_codes,))
        xf = x.astype(jnp.float32)
        resid = xf[:, :, None, :] - codewords[None, None]  # (B,N,K,C)
        dist = scale[None, None] * jnp.sum(resid ** 2, axis=-1)
        assign = nn.softmax(dist, axis=2)
        return jnp.einsum('bnk,bnkc->bkc', assign, resid).astype(x.dtype)


class _EncModule(nn.Module):
    """ref enc_head.py:11-59: project -> Encoding -> BN1d(num_codes) ->
    ReLU -> mean over codes -> sigmoid fc gate; relu(x + x*gamma)."""
    channels: int
    num_codes: int
    norm_cfg: dict = None
    act_cfg: object = 'default'

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        proj = ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='encoding_project')(x, train=train)
        enc = _Encoding(self.num_codes, name='encoding')(
            proj.reshape(b, h * w, c))
        # BN1d over the code axis: make K the feature axis
        from ..utils import NormLayer
        bn_cfg = dict(self.norm_cfg or dict(type='BN'))
        bn_cfg['type'] = 'BN'  # 1d variant of BN/SyncBN
        enc = NormLayer(bn_cfg, name='encoding_bn')(
            jnp.swapaxes(enc, 1, 2)[:, None], train=train)[:, 0]
        enc = nn.relu(jnp.swapaxes(enc, 1, 2))  # back to (B, K, C)
        feat = enc.mean(axis=1)  # (B, C)
        gamma = nn.sigmoid(nn.Dense(c, dtype=x.dtype, name='fc')(feat))
        out = nn.relu(x + x * gamma[:, None, None, :].astype(x.dtype))
        return feat, out


@HEADS.register_module()
class EncHead(BaseDecodeHead):
    """Context encoding head with the se-loss auxiliary
    (ref enc_head.py:61-187)."""
    num_codes: int = 32
    use_se_loss: bool = True
    add_lateral: bool = False
    input_transform: str = 'multiple_select'
    # se-loss recipe (ref _base_/models/encnet_r50-d8.py passes
    # dict(type='CrossEntropyLoss', use_sigmoid=True, loss_weight=0.2));
    # only the weight varies — the criterion is always multilabel BCE.
    loss_se_decode: dict = None

    @nn.compact
    def __call__(self, inputs, train=False):
        inputs = self._transform_inputs(inputs)
        feat = ConvModule(out_channels=self.channels, kernel_size=3,
                          padding=1, norm_cfg=self.norm_cfg,
                          act_cfg=self.act_cfg,
                          name='bottleneck')(inputs[-1], train=train)
        if self.add_lateral:
            from ...ops import resize
            laterals = [
                resize(ConvModule(out_channels=self.channels,
                                  kernel_size=1, norm_cfg=self.norm_cfg,
                                  act_cfg=self.act_cfg,
                                  name=f'lateral_convs_{i}')(
                                      inputs[i], train=train),
                       size=feat.shape[1:3], mode='bilinear',
                       align_corners=self.align_corners)
                for i in range(len(inputs) - 1)]
            feat = ConvModule(out_channels=self.channels, kernel_size=3,
                              padding=1, norm_cfg=self.norm_cfg,
                              act_cfg=self.act_cfg, name='fusion')(
                jnp.concatenate([feat] + laterals, axis=-1), train=train)
        enc_feat, out = _EncModule(self.channels, self.num_codes,
                                   norm_cfg=self.norm_cfg,
                                   act_cfg=self.act_cfg,
                                   name='enc_module')(feat, train=train)
        self.sow('feats', 'enc__tap', enc_feat)
        out_logits = self.cls_seg(out, train=train)
        if self.use_se_loss:
            se = nn.Dense(self.num_classes, name='se_layer')(enc_feat)
            return out_logits, se
        return out_logits

    def losses(self, seg_logit, seg_label, seg_weight=None):
        if isinstance(seg_logit, tuple):
            seg_logit, se_pred = seg_logit
            loss = super().losses(seg_logit, seg_label, seg_weight)
            # se loss: multilabel BCE against classes present in the
            # image (ref :158-187, loss_weight 0.2)
            onehot = jax.nn.one_hot(
                jnp.where(seg_label == self.ignore_index, 0, seg_label),
                self.num_classes)
            valid = (seg_label != self.ignore_index)[..., None]
            present = jnp.max(onehot * valid, axis=(1, 2))
            se_pred = se_pred.astype(jnp.float32)
            bce = jnp.maximum(se_pred, 0) - se_pred * present + \
                jnp.log1p(jnp.exp(-jnp.abs(se_pred)))
            se_weight = (self.loss_se_decode or {}).get('loss_weight', 0.2)
            loss['loss_se'] = se_weight * jnp.mean(bce)
            return loss
        return super().losses(seg_logit, seg_label, seg_weight)
