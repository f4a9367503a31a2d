"""Lovasz-Softmax loss (ref contract: mmseg/models/losses/lovasz_loss.py:225).

JIT-friendly reformulation: the reference filters ignored pixels with boolean
indexing (dynamic shapes). Here invalid pixels get error 0 so they sort to the
end of the descending error sort; positions with zero error contribute nothing
to the Lovasz extension dot-product, so the result is identical with static
shapes.
"""

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import weight_reduce_loss


def _lovasz_grad(gt_sorted):
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_softmax_flat(probs, labels, valid, classes='present',
                         class_weight=None):
    """probs: (P, C) fp32 softmax probs; labels: (P,) int; valid: (P,) bool."""
    C = probs.shape[1]
    labels = jnp.where(valid, labels, -1)

    def class_loss(c):
        fg = (labels == c).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, c]) * valid.astype(jnp.float32)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = jnp.sum(fg) > 0
        return loss, present

    losses, present = jax.vmap(class_loss)(jnp.arange(C))
    if class_weight is not None:
        losses = losses * jnp.asarray(class_weight, jnp.float32)
    if classes == 'present':
        denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        return jnp.sum(losses * present.astype(jnp.float32)) / denom
    return jnp.mean(losses)


def _lovasz_hinge_flat(logits, labels, valid):
    """Binary Lovasz hinge on flat logits (ref lovasz_loss.py:58-79).
    Ignored pixels get error -1e9 (sorted last; relu -> 0 contribution)
    and gt 0 (prefix cumsums of lovasz_grad unaffected) — identical to the
    reference's boolean filtering, with static shapes."""
    labels = labels.astype(jnp.float32)
    signs = 2.0 * jnp.where(valid, labels, 0.0) - 1.0
    errors = jnp.where(valid, 1.0 - logits * signs, -1e9)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = jnp.where(valid, labels, 0.0)[order]
    return jnp.dot(jnp.maximum(errors_sorted, 0.0),
                   _lovasz_grad(gt_sorted))


def lovasz_hinge(logits, labels, classes=None, per_image=False,
                 class_weight=None, reduction='mean', avg_factor=None,
                 ignore_index=255):
    """Binary Lovasz hinge (ref lovasz_loss.py:82-125). ``logits``
    (N, H, W) raw; ``labels`` (N, H, W) in {0, 1} (+ ignore_index).
    ``classes``/``class_weight`` are placeholders like the reference."""
    valid = labels != ignore_index
    if per_image:
        loss = jax.vmap(lambda lg, lb, v: _lovasz_hinge_flat(
            lg.reshape(-1), lb.reshape(-1), v.reshape(-1)))(
                logits, labels, valid)
        return weight_reduce_loss(loss, None, reduction, avg_factor)
    return _lovasz_hinge_flat(logits.reshape(-1), labels.reshape(-1),
                              valid.reshape(-1))


def lovasz_softmax(probs, labels, classes='present', per_image=False,
                   class_weight=None, reduction='mean', avg_factor=None,
                   ignore_index=255):
    """probs NHWC (already softmaxed), labels (N, H, W)."""
    valid = labels != ignore_index
    if per_image:
        def one(p, l, v):
            return _lovasz_softmax_flat(p.reshape(-1, p.shape[-1]),
                                        l.reshape(-1), v.reshape(-1),
                                        classes, class_weight)
        loss = jax.vmap(one)(probs, labels, valid)
        return weight_reduce_loss(loss, None, reduction, avg_factor)
    return _lovasz_softmax_flat(probs.reshape(-1, probs.shape[-1]),
                                labels.reshape(-1), valid.reshape(-1),
                                classes, class_weight)


@LOSSES.register_module()
class LovaszLoss:

    def __init__(self, loss_type='multi_class', classes='present',
                 per_image=False, reduction='mean', class_weight=None,
                 loss_weight=1.0):
        assert loss_type in ('multi_class', 'binary')
        self.loss_type = loss_type
        self.classes = classes
        self.per_image = per_image
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        reduction = reduction_override or self.reduction
        if self.loss_type == 'binary':
            logits = cls_score.astype(jnp.float32)
            if logits.ndim == 4 and logits.shape[-1] == 1:
                logits = logits[..., 0]  # NHWC binary map
            loss = lovasz_hinge(logits, label, per_image=self.per_image,
                                reduction=reduction, avg_factor=avg_factor,
                                ignore_index=ignore_index)
        else:
            probs = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
            loss = lovasz_softmax(probs, label, classes=self.classes,
                                  per_image=self.per_image,
                                  class_weight=self.class_weight,
                                  reduction=reduction,
                                  avg_factor=avg_factor,
                                  ignore_index=ignore_index)
        return self.loss_weight * loss
