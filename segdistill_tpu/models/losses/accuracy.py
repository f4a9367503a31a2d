"""Pixel accuracy (ref contract: mmseg/models/losses/accuracy.py:4-50).

Matches the reference exactly: the denominator is *every* pixel (ignore-index
pixels count as incorrect since no class id equals 255), scaled to percent.
Logits come NHWC (class axis last).
"""

import jax
import jax.numpy as jnp


def accuracy(pred, target, topk=1, thresh=None):
    """pred: (N, ..., C) logits; target: (N, ...) int labels."""
    if isinstance(topk, int):
        topk = (topk,)
        return_single = True
    else:
        return_single = False
    maxk = max(topk)

    if maxk == 1:
        pred_label = jnp.argmax(pred, axis=-1)[..., None]
        pred_value = jnp.max(pred, axis=-1)[..., None]
    else:
        pred_value, pred_label = jax.lax.top_k(pred, maxk)
    correct = pred_label == target[..., None]
    if thresh is not None:
        correct = correct & (pred_value > thresh)

    res = []
    total = target.size
    for k in topk:
        correct_k = jnp.sum(correct[..., :k].astype(jnp.float32))
        res.append(correct_k * (100.0 / total))
    return res[0] if return_single else res


class Accuracy:

    def __init__(self, topk=(1,), thresh=None):
        self.topk = topk
        self.thresh = thresh

    def __call__(self, pred, target):
        return accuracy(pred, target, self.topk, self.thresh)
