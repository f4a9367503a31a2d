"""Cross-entropy segmentation losses
(ref contract: mmseg/models/losses/cross_entropy_loss.py:9-198).

NHWC logits (class axis last), int labels with ignore_index (default 255 from
the heads). Per-pixel CE is computed at >= fp32 — bf16 logits promote to
fp32 (the reference head losses run under ``@force_fp32``,
decode_head.py:217); f64 under jax_enable_x64 stays f64 so the x64 parity
gates see no f32 island.
"""

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import weight_reduce_loss


def _f32floor(a):
    return a.astype(jnp.promote_types(a.dtype, jnp.float32))


def _per_pixel_ce(pred, label, class_weight=None, ignore_index=-100):
    """Elementwise CE with zeros at ignored pixels (= torch F.cross_entropy
    with reduction='none')."""
    pred = _f32floor(pred)
    num_classes = pred.shape[-1]
    valid = (label != ignore_index) & (label >= 0) & (label < num_classes)
    safe_label = jnp.where(valid, label, 0)
    lse = jax.nn.logsumexp(pred, axis=-1)
    picked = jnp.take_along_axis(pred, safe_label[..., None],
                                 axis=-1)[..., 0]
    loss = lse - picked
    if class_weight is not None:
        cw = jnp.asarray(class_weight, dtype=pred.dtype)
        loss = loss * cw[safe_label]
    return jnp.where(valid, loss, 0.0)


def cross_entropy(pred, label, weight=None, class_weight=None,
                  reduction='mean', avg_factor=None, ignore_index=-100):
    loss = _per_pixel_ce(pred, label, class_weight, ignore_index)
    if weight is not None:
        weight = _f32floor(weight)
    return weight_reduce_loss(loss, weight=weight, reduction=reduction,
                              avg_factor=avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction='mean',
                         avg_factor=None, class_weight=None,
                         ignore_index=255):
    """BCE-with-logits path (``use_sigmoid=True``). pred NHWC, label (N,H,W)
    int → expanded one-hot with the ignore mask folded into the weights
    (ref: cross_entropy_loss.py:36-103)."""
    pred = _f32floor(pred)
    if pred.ndim != label.ndim:
        num_classes = pred.shape[-1]
        valid = (label >= 0) & (label != ignore_index) & (label < num_classes)
        safe_label = jnp.where(valid, label, 0)
        onehot = jax.nn.one_hot(safe_label, num_classes, dtype=pred.dtype)
        onehot = onehot * valid[..., None]
        valid_w = valid[..., None].astype(pred.dtype)
        weight = valid_w if weight is None else weight[..., None] * valid_w
        weight = jnp.broadcast_to(weight, pred.shape)
        label = onehot
    label = label.astype(pred.dtype)
    loss = jnp.maximum(pred, 0) - pred * label + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    if class_weight is not None:
        # pos_weight semantics of BCEWithLogits
        cw = jnp.asarray(class_weight, dtype=jnp.float32)
        log_sig = jax.nn.log_sigmoid(pred)
        log_sig_neg = jax.nn.log_sigmoid(-pred)
        loss = -(cw * label * log_sig + (1 - label) * log_sig_neg)
    return weight_reduce_loss(loss, weight, reduction=reduction,
                              avg_factor=avg_factor)


def mask_cross_entropy(pred, target, label, reduction='mean',
                       avg_factor=None, class_weight=None,
                       ignore_index=None):
    """Per-ROI masked BCE (ref cross_entropy_loss.py:100-136): ``pred``
    (N, C, *mask), ``label`` (N,) picks the class channel of each ROI's
    mask prediction; BCE-with-logits against ``target`` (N, *mask),
    mean-reduced, returned with a leading singleton dim like the
    reference's ``[None]``."""
    assert ignore_index is None, 'BCE loss does not support ignore_index'
    assert reduction == 'mean' and avg_factor is None
    pred = pred.astype(jnp.float32)
    pred_slice = jnp.take_along_axis(
        pred, label.reshape(label.shape[0],
                            *([1] * (pred.ndim - 1))).astype(jnp.int32),
        axis=1)[:, 0]
    target = target.astype(jnp.float32)
    loss = jnp.maximum(pred_slice, 0) - pred_slice * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred_slice)))
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    return jnp.mean(loss)[None]


@LOSSES.register_module()
class CrossEntropyLoss:

    def __init__(self, use_sigmoid=False, use_mask=False, reduction='mean',
                 class_weight=None, loss_weight=1.0):
        assert not (use_sigmoid and use_mask)
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        if use_mask:
            self.criterion = mask_cross_entropy
        elif use_sigmoid:
            self.criterion = binary_cross_entropy
        else:
            self.criterion = cross_entropy

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        return self.loss_weight * self.criterion(
            cls_score, label, weight, class_weight=self.class_weight,
            reduction=reduction, avg_factor=avg_factor, **kwargs)
