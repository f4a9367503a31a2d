"""Fused on-device training augmentation (jitted uint8 kernel).

The reference runs its whole geometric+photometric augmentation chain on the
CPU per sample (``mmseg/datasets/pipelines/transforms.py``) — the classic
input-bound regime at batch 2/GPU (SURVEY §3.1 hot loop (3)). The TPU-native
split implemented here:

* host (:class:`PrepareCanvas`): decode + keep-ratio rescale to the
  ratio-1.0 bound ((2048, 512) for ADE) + pad onto a fixed RGB canvas —
  cheap, shape-static output;
* device (:class:`DeviceAugPipeline`): per-sample random scale, 512^2 crop
  with the cat_max_ratio rejection loop (10 candidates, ref
  transforms.py:768-777), horizontal flip, PhotoMetricDistortion and
  normalization — one jit program over the whole batch.

Scale+crop never materializes the resized image: for a traced scale ``r``
and offset the bilinear *sampling matrices* (static shapes, traced values)
are built from iota and applied as two MXU matmuls; the GT uses the nearest
-neighbor selection matrix (exact label values). Photometric math mirrors
cv2's uint8 HSV semantics (H in [0,180)) in float — statistically equivalent
to the host path (not bit-identical; the host pipeline remains the parity
path).
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import image as imutil


class PrepareCanvas:
    """Host-side pipeline transform producing fixed-shape canvases.

    Replaces Resize/RandomCrop/RandomFlip/PhotoMetricDistortion/Normalize/
    Pad in the train pipeline; emits 'img' (canvas_h, canvas_w, 3) uint8
    RGB, 'gt_semantic_seg' uint8, 'valid_hw' (2,) int32.
    """

    def __init__(self, img_scale=(2048, 512), canvas=(512, 2048),
                 seg_pad_val=255):
        self.img_scale = tuple(img_scale)
        self.canvas = tuple(canvas)
        self.seg_pad_val = seg_pad_val

    def __call__(self, results):
        img = results['img']
        gt = results['gt_semantic_seg']
        img = imutil.imrescale(img, self.img_scale)
        gt = imutil.imrescale(gt, self.img_scale, interpolation='nearest')
        h, w = img.shape[:2]
        ch, cw = self.canvas
        if h > ch or w > cw:  # portrait: swap the canvas orientation
            img = np.transpose(img, (1, 0, 2))
            gt = np.transpose(gt, (1, 0))
            h, w = img.shape[:2]
        img = imutil.impad(img, shape=self.canvas, pad_val=0)
        gt = imutil.impad(gt, shape=self.canvas, pad_val=self.seg_pad_val)
        results['img'] = img[..., ::-1].copy()  # BGR -> RGB
        results['gt_semantic_seg'] = gt
        results['valid_hw'] = np.array([h, w], np.int32)
        return results


def _sampling_matrix(out_size, in_size, scale, offset, nearest=False):
    """(out_size, in_size) resampling matrix with traced scale/offset:
    row o picks source position offset + (o + 0.5)/scale - 0.5 (the
    align_corners=False convention of the underlying resize)."""
    o = jnp.arange(out_size, dtype=jnp.float32)
    src = offset + (o + 0.5) / scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)
    d = src[:, None] - j[None, :]
    if nearest:
        idx = jnp.round(src - 0.5 + 1e-6)  # torch/cv2 'nearest' floor-style
        idx = jnp.clip(idx, 0, in_size - 1)
        return (j[None, :] == idx[:, None]).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _resample(img, mh, mw):
    """img (H, W, C) float; mh (h_out, H), mw (w_out, W) -> (h_out, w_out, C)."""
    t = jnp.einsum('oh,hwc->owc', mh, img)
    return jnp.einsum('pw,owc->opc', mw, t)


# ----------------------------------------------------------------- HSV math
def _rgb_to_hsv(img):
    """cv2 uint8-convention HSV on float [0,255] RGB: H in [0,180)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(mx == r, (g - b) / safe % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(diff == 0, 0.0, h) * 30.0  # 60 deg / 2 (cv2 uint8 scale)
    s = jnp.where(mx == 0, 0.0, diff / jnp.where(mx == 0, 1.0, mx)) * 255.0
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    h = hsv[..., 0] / 30.0  # back to [0, 6)
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


class DeviceAugPipeline:
    """Jitted per-batch augmentation. Call with a PRNG key and the canvas
    batch; vmapped over samples."""

    def __init__(self, crop_size=(512, 512), ratio_range=(0.5, 2.0),
                 cat_max_ratio=0.75, ignore_index=255, flip_prob=0.5,
                 brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18,
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), max_cat_tries=10,
                 num_classes=256):
        self.crop_size = tuple(crop_size)
        self.ratio_range = tuple(ratio_range)
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index
        self.flip_prob = flip_prob
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)
        self.max_cat_tries = max_cat_tries
        self.num_classes = num_classes

    # -------------------------------------------------------- geometric
    def _crop_one(self, rng, img, gt, valid_hw):
        ch, cw = self.crop_size
        H, W = img.shape[0], img.shape[1]
        r_rng, off_rng = jax.random.split(rng)
        lo, hi = self.ratio_range
        r = jax.random.uniform(r_rng, (), minval=lo, maxval=hi)
        vh = valid_hw[0].astype(jnp.float32)
        vw = valid_hw[1].astype(jnp.float32)
        rh, rw = vh * r, vw * r  # resized valid extent
        margin_h = jnp.maximum(rh - ch, 0.0)
        margin_w = jnp.maximum(rw - cw, 0.0)

        def gt_hist(offs):
            """class histogram of the crop at candidate offsets (in
            resized coords)."""
            mh = _sampling_matrix(ch, H, r, offs[0] / r, nearest=True)
            mw = _sampling_matrix(cw, W, r, offs[1] / r, nearest=True)
            crop = _resample(gt.astype(jnp.float32)[..., None], mh,
                             mw)[..., 0].astype(jnp.int32)
            valid = crop != self.ignore_index
            safe = jnp.where(valid, crop, 0)
            hist = jnp.zeros(self.num_classes, jnp.int32).at[
                safe.reshape(-1)].add(valid.reshape(-1).astype(jnp.int32))
            return hist

        # the reference's 10-try rejection loop (transforms.py:768-777)
        offs = jax.random.uniform(off_rng, (self.max_cat_tries, 2)) \
            * jnp.stack([margin_h, margin_w])
        if self.cat_max_ratio < 1.0:
            hists = jax.vmap(gt_hist)(offs)
            tot = jnp.maximum(jnp.sum(hists, axis=1), 1)
            mx = jnp.max(hists, axis=1)
            nlab = jnp.sum(hists > 0, axis=1)
            ok = (nlab > 1) & (mx / tot < self.cat_max_ratio)
            # first passing candidate; the last try is used regardless
            first = jnp.argmax(
                jnp.concatenate([ok, jnp.array([True])]))
            pick = jnp.minimum(first, self.max_cat_tries - 1)
        else:
            pick = 0
        off = offs[pick]

        mh_i = _sampling_matrix(ch, H, r, off[0] / r)
        mw_i = _sampling_matrix(cw, W, r, off[1] / r)
        crop_img = _resample(img.astype(jnp.float32), mh_i, mw_i)
        mh_g = _sampling_matrix(ch, H, r, off[0] / r, nearest=True)
        mw_g = _sampling_matrix(cw, W, r, off[1] / r, nearest=True)
        crop_gt = _resample(gt.astype(jnp.float32)[..., None], mh_g,
                            mw_g)[..., 0].astype(jnp.int32)
        # pixels sampled past the resized valid extent -> pad values
        yy = jnp.arange(ch, dtype=jnp.float32)[:, None]
        xx = jnp.arange(cw, dtype=jnp.float32)[None, :]
        inside = ((off[0] + yy) < rh) & ((off[1] + xx) < rw)
        crop_img = jnp.where(inside[..., None], crop_img, 0.0)
        crop_gt = jnp.where(inside, crop_gt, self.ignore_index)
        return crop_img, crop_gt

    # ------------------------------------------------------ photometric
    def _photometric_one(self, rng, img):
        """ref transforms.py:1099-1215 op order & probabilities."""
        keys = jax.random.split(rng, 9)

        def maybe(key, prob_key, fn, x):
            return jnp.where(jax.random.bernoulli(prob_key), fn(x), x)

        def clip(x):
            return jnp.clip(x, 0.0, 255.0)

        img = maybe(
            keys[0], keys[1],
            lambda x: clip(x + jax.random.uniform(
                keys[0], (), minval=-self.brightness_delta,
                maxval=self.brightness_delta)), img)

        def contrast(x, key):
            alpha = jax.random.uniform(key, (),
                                       minval=self.contrast_range[0],
                                       maxval=self.contrast_range[1])
            return clip(x * alpha)

        mode = jax.random.bernoulli(keys[2])
        do_c = jax.random.bernoulli(keys[3])
        img = jnp.where(mode & do_c, contrast(img, keys[4]), img)

        def saturation(x):
            hsv = _rgb_to_hsv(x)
            alpha = jax.random.uniform(keys[5], (),
                                       minval=self.saturation_range[0],
                                       maxval=self.saturation_range[1])
            hsv = hsv.at[..., 1].set(clip(hsv[..., 1] * alpha))
            return _hsv_to_rgb(hsv)

        img = maybe(keys[5], keys[6], saturation, img)

        def hue(x):
            hsv = _rgb_to_hsv(x)
            delta = jax.random.uniform(keys[7], (),
                                       minval=-self.hue_delta,
                                       maxval=self.hue_delta)
            hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 180.0)
            return _hsv_to_rgb(hsv)

        img = maybe(keys[7], keys[8], hue, img)
        img = jnp.where((~mode) & do_c, contrast(img, keys[4]), img)
        return img

    def _one(self, rng, img, gt, valid_hw):
        crop_rng, flip_rng, photo_rng = jax.random.split(rng, 3)
        img, gt = self._crop_one(crop_rng, img, gt, valid_hw)
        flip = jax.random.bernoulli(flip_rng, self.flip_prob)
        img = jnp.where(flip, img[:, ::-1], img)
        gt = jnp.where(flip, gt[:, ::-1], gt)
        img = self._photometric_one(photo_rng, img)
        img = (img - self.mean) / self.std
        return img, gt

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, rng, img_canvas, gt_canvas, valid_hw):
        """img_canvas (B,Hc,Wc,3) uint8 RGB; gt (B,Hc,Wc) uint8;
        valid_hw (B,2) -> (img (B,ch,cw,3) f32, gt (B,ch,cw) i32)."""
        rngs = jax.random.split(rng, img_canvas.shape[0])
        return jax.vmap(self._one)(rngs, img_canvas,
                                   gt_canvas.astype(jnp.int32), valid_hw)
