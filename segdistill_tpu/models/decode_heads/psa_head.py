"""PSAHead — point-wise spatial attention
(ref contract: mmseg/models/decode_heads/psa_head.py:18-196).

The reference depends on mmcv's compiled ``PSAMask`` CUDA op, which
scatters each position's relative (mask_h x mask_w) attention window into
an absolute (H*W) attention map. TPU-native formulation: the scatter is a
*static* gather — for every (source, target) pair the relative-window
index and validity are precomputed host-side (numpy, lru-cached per
shape), and the op becomes one ``take_along_axis`` + mask, feeding an
MXU ``einsum`` for the aggregation (the reference's ``torch.bmm``).

Semantics preserved exactly, including the quirks:

* softmax (when ``psa_softmax``) runs over the FULL H*W axis of the
  scattered map with the out-of-window zeros participating (the reference
  softmaxes after PSAMask's zero-fill);
* ``proj`` is a 1x1 ConvModule with padding=1 — it spatially pads the
  output by one pixel before the resize back (ref :96-103);
* shrink_factor handling flips align_corners exactly as ref :122-135.
"""

import functools

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..utils import ConvModule
from .decode_head import BaseDecodeHead


@functools.lru_cache(maxsize=32)
def _psa_gather_indices(h, w, mask_h, mask_w):
    """-> (relidx, valid): for source s=(i,j) and target t=(y,x),
    relidx[s,t] = (i-y+half_h)*mask_w + (j-x+half_w) clipped into range,
    valid[s,t] = whether (s,t) falls inside the mask window
    (ref mmcv psamask op: half = (mask-1)//2, zero outside)."""
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    ii, yy = np.meshgrid(np.arange(h), np.arange(h), indexing='ij')
    jj, xx = np.meshgrid(np.arange(w), np.arange(w), indexing='ij')
    rel_h = (ii - yy + half_h)  # (h_src, h_tgt)
    rel_w = (jj - xx + half_w)  # (w_src, w_tgt)
    valid = ((rel_h >= 0)[:, None, :, None] & (rel_h < mask_h)[:, None, :, None]
             & (rel_w >= 0)[None, :, None, :] & (rel_w < mask_w)[None, :, None, :])
    rel = (np.clip(rel_h, 0, mask_h - 1)[:, None, :, None] * mask_w
           + np.clip(rel_w, 0, mask_w - 1)[None, :, None, :])
    hw = h * w
    # (h_s, w_s, h_t, w_t) -> (s, t)
    rel = rel.transpose(0, 1, 2, 3).reshape(hw, hw)
    valid = valid.transpose(0, 1, 2, 3).reshape(hw, hw)
    return rel.astype(np.int32), valid


def psa_mask(y, mask_size, psa_type):
    """(N, mask_h*mask_w, H, W) NCHW-like attention logits ->
    (N, H*W source, H*W target) scattered map (zeros outside window).

    'collect':    out[n, s, t] = y[n, rel(s, t), t]
    'distribute': out[n, q, p] = y[n, rel(p, q), q]  (transpose of the
                  collect gather with roles swapped — ref psamask kernel)
    """
    mask_h, mask_w = mask_size
    n, _, h, w = y.shape
    hw = h * w
    rel, valid = _psa_gather_indices(h, w, mask_h, mask_w)
    y_r = y.reshape(n, mask_h * mask_w, hw)
    gathered = jnp.take_along_axis(
        y_r, jnp.asarray(rel)[None], axis=1)      # (n, s, t): y[rel(s,t), t]
    gathered = gathered * jnp.asarray(valid, gathered.dtype)[None]
    if psa_type == 'distribute':
        gathered = jnp.transpose(gathered, (0, 2, 1))
    return gathered


def _aggregate(feat_nhwc, y_sq, normalization_factor):
    """ref :147-149 bmm: out[:, p, c] = sum_q feat[q, c] * y[q, p]."""
    n, h, w, c = feat_nhwc.shape
    out = jnp.einsum('nqc,nqp->npc', feat_nhwc.reshape(n, h * w, c),
                     y_sq, preferred_element_type=jnp.float32)
    return (out.astype(feat_nhwc.dtype) / normalization_factor).reshape(
        n, h, w, c)


@HEADS.register_module()
class PSAHead(BaseDecodeHead):
    mask_size: tuple = None
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: float = 1.0
    psa_softmax: bool = True

    def _shrunk(self, x, align_corners):
        h, w = x.shape[1:3]
        if self.shrink_factor != 1:
            if h % self.shrink_factor and w % self.shrink_factor:
                h = (h - 1) // self.shrink_factor + 1
                w = (w - 1) // self.shrink_factor + 1
                align_corners = True
            else:
                h = h // self.shrink_factor
                w = w // self.shrink_factor
                align_corners = False
            x = resize(x, size=(h, w), mode='bilinear',
                       align_corners=align_corners)
        return x, align_corners

    def _attention(self, x, name, train):
        mask_h, mask_w = self.mask_size
        y = ConvModule(out_channels=self.channels, kernel_size=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'{name}_0')(x, train=train)
        return nn.Conv(mask_h * mask_w, (1, 1), use_bias=False,
                       dtype=y.dtype, name=f'{name}_1')(y)

    def _psa_weights(self, y_nhwc, psa_type, compact_transpose):
        """NHWC attention logits -> (n, q, p) weights (softmax over q).

        Compact mode skips PSAMask; the reference transposes the raw
        (n, hw, hw) map only on the single-direction 'collect' path and
        the bi-direction *distribute* branch (ref :137-141 vs :171-174);
        the other compact branches use the conv output as-is.
        """
        n, h, w, _ = y_nhwc.shape
        y = jnp.transpose(y_nhwc, (0, 3, 1, 2))
        if self.compact:
            y_sq = y.reshape(n, h * w, h * w)
            if compact_transpose:
                y_sq = jnp.transpose(y_sq, (0, 2, 1))
        else:
            y_sq = psa_mask(y, self.mask_size, psa_type)
        if self.psa_softmax:
            y_sq = nn.softmax(y_sq.astype(jnp.float32), axis=1).astype(
                y_sq.dtype)
        return y_sq

    @nn.compact
    def __call__(self, inputs, train=False):
        x = self._transform_inputs(inputs)
        identity = x
        align_corners = self.align_corners

        if self.psa_type in ('collect', 'distribute'):
            out = ConvModule(out_channels=self.channels, kernel_size=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='reduce')(x, train=train)
            out, align_corners = self._shrunk(out, align_corners)
            y = self._attention(out, 'attention', train)
            y_sq = self._psa_weights(y, self.psa_type,
                                     self.psa_type == 'collect')
            out = _aggregate(out, y_sq, self.normalization_factor)
        else:  # bi-direction (ref :151-186)
            x_col = ConvModule(out_channels=self.channels, kernel_size=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name='reduce')(x, train=train)
            x_dis = ConvModule(out_channels=self.channels, kernel_size=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name='reduce_p')(x, train=train)
            x_col, align_corners = self._shrunk(x_col, align_corners)
            x_dis, _ = self._shrunk(x_dis, self.align_corners)
            y_col = self._attention(x_col, 'attention', train)
            y_dis = self._attention(x_dis, 'attention_p', train)
            col_w = self._psa_weights(y_col, 'collect', False)
            dis_w = self._psa_weights(y_dis, 'distribute', True)
            x_col = _aggregate(x_col, col_w, self.normalization_factor)
            x_dis = _aggregate(x_dis, dis_w, self.normalization_factor)
            out = jnp.concatenate([x_col, x_dis], axis=-1)

        in_ch = identity.shape[-1]
        # ref :96-103: 1x1 conv with padding=1 — pads one pixel spatially
        out = ConvModule(out_channels=in_ch, kernel_size=1, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='proj')(out, train=train)
        out = resize(out, size=identity.shape[1:3], mode='bilinear',
                     align_corners=align_corners)
        out = ConvModule(out_channels=self.channels, kernel_size=3,
                         padding=1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate([identity, out], axis=-1), train=train)
        return self.cls_seg(out, train=train)
