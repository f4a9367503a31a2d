"""Pixel samplers (ref contract: mmseg/core/seg/sampler/ohem_pixel_sampler.py:8-76).

OHEM jit-friendly rewrite: the reference sorts the flattened loss/prob and
slices by a data-dependent count. Here the per-batch threshold is derived via
``top_k`` over static shapes and applied as a boolean weight — identical
selection, no dynamic shapes.
"""

import jax
import jax.numpy as jnp

from .builder import PIXEL_SAMPLERS


class BasePixelSampler:

    def sample(self, seg_logit, seg_label):
        raise NotImplementedError


@PIXEL_SAMPLERS.register_module()
class OHEMPixelSampler(BasePixelSampler):
    """seg_logit NHWC, seg_label (B, H, W). Returns per-pixel weights."""

    def __init__(self, context=None, thresh=None, min_kept=100000,
                 ignore_index=255):
        assert min_kept > 1
        self.context = context
        self.thresh = thresh
        self.min_kept = min_kept
        self.ignore_index = ignore_index

    def sample(self, seg_logit, seg_label):
        B = seg_logit.shape[0]
        num_classes = seg_logit.shape[-1]
        valid = seg_label != self.ignore_index
        min_kept = min(self.min_kept * B, valid.size)

        if self.thresh is not None:
            probs = jax.nn.softmax(seg_logit.astype(jnp.float32), axis=-1)
            safe_label = jnp.where(valid, seg_label, 0)
            gt_prob = jnp.take_along_axis(
                probs, safe_label[..., None], axis=-1)[..., 0]
            # invalid pixels get prob 2.0 so they sort to the "easy" end
            gt_prob = jnp.where(valid, gt_prob, 2.0).reshape(-1)
            # ref indexes sort_prob[min_kept] (0-based) — the
            # (min_kept+1)-th smallest (mmseg ohem_pixel_sampler.py:60)
            k = min(min_kept + 1, gt_prob.size)
            kth = -jax.lax.top_k(-gt_prob, k)[0][-1]
            threshold = jnp.maximum(kth, self.thresh)
            seg_weight = (gt_prob < threshold) & valid.reshape(-1)
            return seg_weight.reshape(seg_label.shape).astype(jnp.float32)

        # pure top-k hardest by CE loss
        logit = seg_logit.astype(jnp.float32)
        safe_label = jnp.where(valid, seg_label, 0)
        lse = jax.nn.logsumexp(logit, axis=-1)
        picked = jnp.take_along_axis(logit, safe_label[..., None],
                                     axis=-1)[..., 0]
        losses = jnp.where(valid, lse - picked, -jnp.inf).reshape(-1)
        kth = jax.lax.top_k(losses, min_kept)[0][-1]
        seg_weight = (losses >= kth) & valid.reshape(-1)
        return seg_weight.reshape(seg_label.shape).astype(jnp.float32)
