"""Geometric + photometric transforms
(ref contract: mmseg/datasets/pipelines/transforms.py).

Host-side numpy/cv2 implementations with the reference's exact sampling
semantics. Randomness: every transform draws from the per-sample
``results['rng']`` (an ``np.random.RandomState`` injected by the
dataloader) when present, else the global ``np.random`` — the per-sample
stream makes augmentation deterministic by seed and independent across
dataloader worker threads (the reference seeds per worker *process*,
ref datasets/builder.py:155-169; threads sharing numpy's global RNG would
race). The
jitted on-device fused augmentation alternative lives in
``segdistill_tpu/data/device_aug.py``; this module is the parity path and
handles variable-size images.
"""

import numpy as np
from numpy import random

from ...utils import image as imutil
from ..builder import PIPELINES


def _rng(results):
    """Per-sample RNG if the dataloader injected one, else global np.random
    (same method surface: randint/uniform/rand/random_sample)."""
    return results.get('rng') or np.random


class _ResizeBase:
    """Shared scale-sampling logic (ref transforms.py:44-152/236-434)."""

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None, keep_ratio=True):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]

        if ratio_range is not None:
            assert self.img_scale is None or len(self.img_scale) == 1
        else:
            assert multiscale_mode in ('value', 'range')

        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio

    @staticmethod
    def random_select(img_scales, rng=np.random):
        scale_idx = rng.randint(len(img_scales))
        return img_scales[scale_idx], scale_idx

    @staticmethod
    def random_sample(img_scales, rng=np.random):
        assert len(img_scales) == 2
        longs = [max(s) for s in img_scales]
        shorts = [min(s) for s in img_scales]
        long_edge = rng.randint(min(longs), max(longs) + 1)
        short_edge = rng.randint(min(shorts), max(shorts) + 1)
        return (long_edge, short_edge), None

    @staticmethod
    def random_sample_ratio(img_scale, ratio_range, rng=np.random):
        min_ratio, max_ratio = ratio_range
        ratio = rng.random_sample() * (max_ratio - min_ratio) \
            + min_ratio
        return (int(img_scale[0] * ratio), int(img_scale[1] * ratio)), None

    def _random_scale(self, results):
        rng = _rng(results)
        if self.ratio_range is not None:
            if self.img_scale is None:
                h, w = results['img'].shape[:2]
                scale, scale_idx = self.random_sample_ratio(
                    (w, h), self.ratio_range, rng)
            else:
                scale, scale_idx = self.random_sample_ratio(
                    self.img_scale[0], self.ratio_range, rng)
        elif len(self.img_scale) == 1:
            scale, scale_idx = self.img_scale[0], 0
        elif self.multiscale_mode == 'range':
            scale, scale_idx = self.random_sample(self.img_scale, rng)
        else:
            scale, scale_idx = self.random_select(self.img_scale, rng)
        results['scale'] = scale
        results['scale_idx'] = scale_idx


@PIPELINES.register_module()
class Resize(_ResizeBase):
    """Multiscale resize (4 modes, ref transforms.py:236-434)."""

    def _resize_img(self, results):
        if self.keep_ratio:
            img, scale_factor = imutil.imrescale(
                results['img'], results['scale'], return_scale=True)
            new_h, new_w = img.shape[:2]
            h, w = results['img'].shape[:2]
            w_scale, h_scale = new_w / w, new_h / h
        else:
            img, w_scale, h_scale = imutil.imresize(
                results['img'], results['scale'], return_scale=True)
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], dtype=np.float32)
        results['keep_ratio'] = self.keep_ratio

    def _resize_seg(self, results):
        for key in results.get('seg_fields', []):
            if self.keep_ratio:
                results[key] = imutil.imrescale(
                    results[key], results['scale'], interpolation='nearest')
            else:
                results[key] = imutil.imresize(
                    results[key], results['scale'],
                    interpolation='nearest')

    def __call__(self, results):
        if 'scale' not in results:
            self._random_scale(results)
        self._resize_img(results)
        self._resize_seg(results)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(img_scale={self.img_scale}, '
                f'multiscale_mode={self.multiscale_mode}, '
                f'ratio_range={self.ratio_range}, '
                f'keep_ratio={self.keep_ratio})')


@PIPELINES.register_module()
class AlignedResize(Resize):
    """Resize then snap both sides up to a multiple of ``size_divisor`` —
    the TTA resize keeping jit shapes bucketable (ref transforms.py:9-234)."""

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None, keep_ratio=True, size_divisor=32):
        super().__init__(img_scale, multiscale_mode, ratio_range, keep_ratio)
        self.size_divisor = size_divisor

    def _align(self, img, interpolation='bilinear'):
        align_h = int(np.ceil(img.shape[0] / self.size_divisor)) \
            * self.size_divisor
        align_w = int(np.ceil(img.shape[1] / self.size_divisor)) \
            * self.size_divisor
        return imutil.imresize(img, (align_w, align_h),
                               interpolation=interpolation)

    def _resize_img(self, results):
        if self.keep_ratio:
            img = imutil.imrescale(results['img'], results['scale'])
            img = self._align(img)
            new_h, new_w = img.shape[:2]
            h, w = results['img'].shape[:2]
            w_scale, h_scale = new_w / w, new_h / h
        else:
            img, w_scale, h_scale = imutil.imresize(
                results['img'], results['scale'], return_scale=True)
            h, w = img.shape[:2]
            assert h % self.size_divisor == 0 and w % self.size_divisor == 0
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], dtype=np.float32)
        results['keep_ratio'] = self.keep_ratio

    def _resize_seg(self, results):
        for key in results.get('seg_fields', []):
            if self.keep_ratio:
                gt = imutil.imrescale(results[key], results['scale'],
                                      interpolation='nearest')
                gt = self._align(gt, interpolation='nearest')
            else:
                gt = imutil.imresize(results[key], results['scale'],
                                     interpolation='nearest')
            results[key] = gt


@PIPELINES.register_module()
class RandomFlip:
    """(ref transforms.py:464-517)."""

    def __init__(self, prob=None, flip_ratio=None, direction='horizontal'):
        self.prob = prob if prob is not None else flip_ratio
        self.direction = direction

    def __call__(self, results):
        if 'flip' not in results:
            flip = True if self.prob is not None \
                and _rng(results).rand() < self.prob else False
            results['flip'] = flip
        if 'flip_direction' not in results:
            results['flip_direction'] = self.direction
        if results['flip']:
            results['img'] = imutil.imflip(
                results['img'], direction=results['flip_direction']).copy()
            for key in results.get('seg_fields', []):
                results[key] = imutil.imflip(
                    results[key],
                    direction=results['flip_direction']).copy()
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(prob={self.prob})'


@PIPELINES.register_module()
class Pad:
    """Pad to fixed size or divisor; img pad 0, seg pad 255
    (ref transforms.py:519-588)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        assert (size is None) != (size_divisor is None)

    def __call__(self, results):
        if self.size is not None:
            padded = imutil.impad(results['img'], shape=self.size,
                                  pad_val=self.pad_val)
        else:
            padded = imutil.impad_to_multiple(
                results['img'], self.size_divisor, pad_val=self.pad_val)
        results['img'] = padded
        results['pad_shape'] = padded.shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        for key in results.get('seg_fields', []):
            results[key] = imutil.impad(results[key],
                                        shape=padded.shape[:2],
                                        pad_val=self.seg_pad_val)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(size={self.size}, '
                f'size_divisor={self.size_divisor}, '
                f'pad_val={self.pad_val})')


@PIPELINES.register_module()
class Normalize:
    """(img - mean) / std with optional BGR->RGB
    (ref transforms.py:590-630)."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.array(mean, dtype=np.float32)
        self.std = np.array(std, dtype=np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        results['img'] = imutil.imnormalize(results['img'], self.mean,
                                            self.std, self.to_rgb)
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(mean={list(self.mean)}, '
                f'std={list(self.std)}, to_rgb={self.to_rgb})')


@PIPELINES.register_module()
class Rerange:
    """Linear rescale of pixel values to [min_value, max_value]
    (ref transforms.py:632-676)."""

    def __init__(self, min_value=0, max_value=255):
        self.min_value = min_value
        self.max_value = max_value

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        lo, hi = np.min(img), np.max(img)
        assert hi > lo
        img = (img - lo) / (hi - lo)
        results['img'] = img * (self.max_value - self.min_value) \
            + self.min_value
        return results


@PIPELINES.register_module()
class CLAHE:
    """(ref transforms.py:678-721)."""

    def __init__(self, clip_limit=40.0, tile_grid_size=(8, 8)):
        self.clip_limit = clip_limit
        self.tile_grid_size = tuple(tile_grid_size)

    def __call__(self, results):
        img = results['img']
        for i in range(img.shape[2]):
            img[:, :, i] = imutil.clahe(img[:, :, i], self.clip_limit,
                                        self.tile_grid_size)
        results['img'] = img
        return results


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with the cat_max_ratio rejection loop (<=10 tries)
    (ref transforms.py:723-793)."""

    def __init__(self, crop_size, cat_max_ratio=1.0, ignore_index=255):
        assert crop_size[0] > 0 and crop_size[1] > 0
        self.crop_size = tuple(crop_size)
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def get_crop_bbox(self, img, rng=np.random):
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        offset_h = rng.randint(0, margin_h + 1)
        offset_w = rng.randint(0, margin_w + 1)
        return (offset_h, offset_h + self.crop_size[0],
                offset_w, offset_w + self.crop_size[1])

    @staticmethod
    def crop(img, bbox):
        y1, y2, x1, x2 = bbox
        return img[y1:y2, x1:x2, ...]

    def __call__(self, results):
        img = results['img']
        rng = _rng(results)
        crop_bbox = self.get_crop_bbox(img, rng)
        if self.cat_max_ratio < 1.0:
            for _ in range(10):
                seg_tmp = self.crop(results['gt_semantic_seg'], crop_bbox)
                labels, cnt = np.unique(seg_tmp, return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and np.max(cnt) / np.sum(cnt) \
                        < self.cat_max_ratio:
                    break
                crop_bbox = self.get_crop_bbox(img, rng)

        img = self.crop(img, crop_bbox)
        results['img'] = img
        results['img_shape'] = img.shape
        for key in results.get('seg_fields', []):
            results[key] = self.crop(results[key], crop_bbox)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(crop_size={self.crop_size})'


@PIPELINES.register_module()
class CenterCrop:
    """(ref transforms.py:795-852)."""

    def __init__(self, crop_size):
        self.crop_size = tuple(crop_size)

    def __call__(self, results):
        img = results['img']
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        y1 = margin_h // 2
        x1 = margin_w // 2
        bbox = (y1, y1 + self.crop_size[0], x1, x1 + self.crop_size[1])
        results['img'] = RandomCrop.crop(img, bbox)
        results['img_shape'] = results['img'].shape
        for key in results.get('seg_fields', []):
            results[key] = RandomCrop.crop(results[key], bbox)
        return results


@PIPELINES.register_module()
class RandomRotate:
    """(ref transforms.py:854-935)."""

    def __init__(self, prob, degree, pad_val=0, seg_pad_val=255,
                 center=None, auto_bound=False):
        self.prob = prob
        if isinstance(degree, (float, int)):
            degree = (-degree, degree)
        self.degree = degree
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center
        self.auto_bound = auto_bound

    def __call__(self, results):
        rng = _rng(results)
        rotate = rng.rand() < self.prob
        degree = rng.uniform(min(*self.degree), max(*self.degree))
        if rotate:
            results['img'] = imutil.imrotate(
                results['img'], angle=degree, border_value=self.pad_val,
                center=self.center, auto_bound=self.auto_bound)
            for key in results.get('seg_fields', []):
                results[key] = imutil.imrotate(
                    results[key], angle=degree,
                    border_value=self.seg_pad_val, center=self.center,
                    auto_bound=self.auto_bound, interpolation='nearest')
        return results


@PIPELINES.register_module()
class RGB2Gray:
    """(ref transforms.py:937-990)."""

    def __init__(self, out_channels=None, weights=(0.299, 0.587, 0.114)):
        self.out_channels = out_channels
        self.weights = weights

    def __call__(self, results):
        img = results['img']
        weights = np.array(self.weights).reshape((1, 1, -1))
        gray = (img * weights).sum(2, keepdims=True)
        if self.out_channels is None:
            gray = gray.repeat(img.shape[2], axis=2)
        else:
            gray = gray.repeat(self.out_channels, axis=2)
        results['img'] = gray
        results['img_shape'] = gray.shape
        return results


@PIPELINES.register_module()
class AdjustGamma:
    """(ref transforms.py:992-1026)."""

    def __init__(self, gamma=1.0):
        assert gamma > 0
        self.gamma = gamma
        inv_gamma = 1.0 / gamma
        self.table = np.array([(i / 255.0) ** inv_gamma * 255
                               for i in np.arange(256)]).astype('uint8')

    def __call__(self, results):
        results['img'] = self.table[
            np.asarray(results['img'], np.uint8)]
        return results


@PIPELINES.register_module()
class MaillaryHack:
    """Map Mapillary's 65 classes onto the cityscapes 19
    (ref transforms.py:1028-1067)."""

    def __init__(self):
        self.map = [[13, 24, 41], [2, 15], [17], [6], [3], [45, 47], [48],
                    [50], [30], [29], [27], [19], [20, 21, 22], [55], [61],
                    [54], [58], [57], [52]]
        self.others = [i for i in range(66)
                       if not any(i in m for m in self.map)]

    def __call__(self, results):
        gt_map = results['gt_semantic_seg']
        out = np.full_like(gt_map, 255)
        for value in self.others:
            out[gt_map == value] = 255
        for index, map_list in enumerate(self.map):
            for value in map_list:
                out[gt_map == value] = index
        results['gt_semantic_seg'] = out
        return results


@PIPELINES.register_module()
class SegRescale:
    """(ref transforms.py:1069-1097)."""

    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in results.get('seg_fields', []):
            if self.scale_factor != 1:
                results[key] = imutil.imrescale(
                    results[key], self.scale_factor,
                    interpolation='nearest')
        return results


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """brightness/contrast/saturation/hue, each with prob 0.5, contrast
    position randomized (ref transforms.py:1099-1215)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def convert(img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    def brightness(self, img, rng=random):
        if rng.randint(2):
            return self.convert(
                img, beta=rng.uniform(-self.brightness_delta,
                                      self.brightness_delta))
        return img

    def contrast(self, img, rng=random):
        if rng.randint(2):
            return self.convert(
                img, alpha=rng.uniform(self.contrast_lower,
                                       self.contrast_upper))
        return img

    def saturation(self, img, rng=random):
        if rng.randint(2):
            img = imutil.bgr2hsv(img)
            img[:, :, 1] = self.convert(
                img[:, :, 1], alpha=rng.uniform(self.saturation_lower,
                                                self.saturation_upper))
            img = imutil.hsv2bgr(img)
        return img

    def hue(self, img, rng=random):
        if rng.randint(2):
            img = imutil.bgr2hsv(img)
            img[:, :, 0] = (img[:, :, 0].astype(int) + rng.randint(
                -self.hue_delta, self.hue_delta)) % 180
            img = imutil.hsv2bgr(img)
        return img

    def __call__(self, results):
        rng = _rng(results)
        img = results['img']
        img = self.brightness(img, rng)
        mode = rng.randint(2)
        if mode == 1:
            img = self.contrast(img, rng)
        img = self.saturation(img, rng)
        img = self.hue(img, rng)
        if mode == 0:
            img = self.contrast(img, rng)
        results['img'] = img
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}'
                f'(brightness_delta={self.brightness_delta})')
