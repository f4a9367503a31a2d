"""Host-side image ops with mmcv-compatible semantics, built on cv2.

The reference's input pipeline leans on mmcv's cv2 wrappers
(``imrescale``/``imresize``/``imflip``/``impad``/``imnormalize``,
loading.py:61-62, transforms.py). These are the CPU/preprocessing
counterparts; the fused on-device augmentation path lives in
``segdistill_tpu/data/device_aug.py``.
"""

import os.path as osp

import cv2
import numpy as np

_INTERP = {
    'nearest': cv2.INTER_NEAREST,
    'bilinear': cv2.INTER_LINEAR,
    'bicubic': cv2.INTER_CUBIC,
    'area': cv2.INTER_AREA,
    'lanczos': cv2.INTER_LANCZOS4,
}


def imread(path, flag='color', channel_order='bgr'):
    if not osp.isfile(path):
        raise FileNotFoundError(f'img file does not exist: {path}')
    if flag == 'color':
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if channel_order == 'rgb':
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    elif flag == 'grayscale':
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    elif flag == 'unchanged':
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    else:
        raise ValueError(flag)
    if img is None:
        raise OSError(f'failed to decode image: {path}')
    return img


def imwrite(img, path):
    return cv2.imwrite(path, img)


def imresize(img, size, return_scale=False, interpolation='bilinear'):
    """size is (w, h) — mmcv convention."""
    h, w = img.shape[:2]
    resized = cv2.resize(img, size, interpolation=_INTERP[interpolation])
    if not return_scale:
        return resized
    return resized, size[0] / w, size[1] / h


def rescale_size(old_size, scale, return_scale=False):
    """Compute the keep-ratio target size. ``scale``: float factor or
    (long, short)-ish tuple (order-insensitive via max/min, mmcv semantics)."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    elif isinstance(scale, (tuple, list)):
        max_long, max_short = max(scale), min(scale)
        scale_factor = min(max_long / max(h, w), max_short / min(h, w))
    else:
        raise TypeError(f'invalid scale type {type(scale)}')
    new_size = (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5))
    if return_scale:
        return new_size, scale_factor
    return new_size


def imrescale(img, scale, return_scale=False, interpolation='bilinear'):
    h, w = img.shape[:2]
    new_size, scale_factor = rescale_size((w, h), scale, return_scale=True)
    resized = imresize(img, new_size, interpolation=interpolation)
    if return_scale:
        return resized, scale_factor
    return resized


def imflip(img, direction='horizontal'):
    if direction == 'horizontal':
        return np.flip(img, axis=1)
    if direction == 'vertical':
        return np.flip(img, axis=0)
    raise ValueError(direction)


def impad(img, shape=None, padding=None, pad_val=0):
    """Pad to target (h, w) bottom-right (mmcv impad semantics)."""
    if shape is not None:
        pad_h = max(shape[0] - img.shape[0], 0)
        pad_w = max(shape[1] - img.shape[1], 0)
        padding = (0, 0, pad_w, pad_h)  # left, top, right, bottom
    left, top, right, bottom = padding
    return cv2.copyMakeBorder(img, top, bottom, left, right,
                              cv2.BORDER_CONSTANT, value=pad_val)


def impad_to_multiple(img, divisor, pad_val=0):
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def imnormalize(img, mean, std, to_rgb=True):
    img = img.astype(np.float32)
    if to_rgb:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return (img - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)


def bgr2hsv(img):
    return cv2.cvtColor(img, cv2.COLOR_BGR2HSV)


def hsv2bgr(img):
    return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)


def bgr2gray(img, keepdim=False):
    out = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if keepdim:
        out = out[..., None]
    return out


def rgb2gray(img, keepdim=False):
    out = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    if keepdim:
        out = out[..., None]
    return out


def imrotate(img, angle, center=None, scale=1.0, border_value=0,
             interpolation='bilinear', auto_bound=False):
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, scale)
    if auto_bound:
        cos = np.abs(matrix[0, 0])
        sin = np.abs(matrix[0, 1])
        new_w = h * sin + w * cos
        new_h = h * cos + w * sin
        matrix[0, 2] += (new_w - w) * 0.5
        matrix[1, 2] += (new_h - h) * 0.5
        w, h = int(np.round(new_w)), int(np.round(new_h))
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=_INTERP[interpolation],
                          borderValue=border_value)


def clahe(img, clip_limit=40.0, tile_grid_size=(8, 8)):
    c = cv2.createCLAHE(clip_limit, tile_grid_size)
    return c.apply(np.asarray(img, np.uint8))
