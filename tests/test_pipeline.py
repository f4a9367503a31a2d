"""Transform invariants (ref strategy: tests/test_transform.py)."""

import numpy as np
import pytest

from segdistill_tpu.datasets.pipelines import (Compose, Normalize, Pad,
                                               PhotoMetricDistortion,
                                               RandomCrop, RandomFlip,
                                               Resize, AlignedResize)


def _results(h=60, w=80):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    gt = rng.randint(0, 19, (h, w), np.uint8)
    return dict(img=img, gt_semantic_seg=gt,
                seg_fields=['gt_semantic_seg'],
                img_shape=img.shape, ori_shape=img.shape)


def test_random_crop_size_and_alignment():
    np.random.seed(3)
    res = RandomCrop(crop_size=(32, 32), cat_max_ratio=0.75)(_results())
    assert res['img'].shape == (32, 32, 3)
    assert res['gt_semantic_seg'].shape == (32, 32)


def test_random_flip_involution():
    res = _results()
    img0 = res['img'].copy()
    t = RandomFlip(prob=1.0)
    once = t(dict(res))
    twice = t(dict(once, flip=True))
    # flipping twice with the same direction restores the original
    np.testing.assert_array_equal(np.flip(once['img'], axis=1), img0)


def test_resize_keep_ratio_divides():
    res = _results(100, 200)
    out = Resize(img_scale=(128, 64), keep_ratio=True)(res)
    h, w = out['img'].shape[:2]
    assert max(h, w) <= 128 and min(h, w) <= 64
    assert out['gt_semantic_seg'].shape == (h, w)


def test_aligned_resize_divisible():
    res = _results(100, 201)
    out = AlignedResize(img_scale=(2048, 512), keep_ratio=True,
                        size_divisor=32)(res)
    h, w = out['img'].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert out['gt_semantic_seg'].shape == (h, w)


def test_pad_and_seg_pad_val():
    res = _results(30, 40)
    out = Pad(size=(64, 64), pad_val=0, seg_pad_val=255)(res)
    assert out['img'].shape == (64, 64, 3)
    assert out['gt_semantic_seg'].shape == (64, 64)
    assert (out['gt_semantic_seg'][40:, :] == 255).all()
    assert (out['img'][40:, :, :] == 0).all()


def test_normalize():
    res = _results()
    mean, std = [123.675, 116.28, 103.53], [58.395, 57.12, 57.375]
    out = Normalize(mean=mean, std=std, to_rgb=True)(dict(res))
    # rgb flip + normalize
    expected = (res['img'][..., ::-1].astype(np.float32) - mean) / std
    np.testing.assert_allclose(out['img'], expected, rtol=1e-5)


def test_photometric_dtype_preserved():
    np.random.seed(0)
    out = PhotoMetricDistortion()(_results())
    assert out['img'].dtype == np.uint8


def test_compose_from_cfg():
    pipeline = Compose([
        dict(type='RandomFlip', prob=0.0),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ])
    out = pipeline(_results())
    assert set(out) == {'img', 'gt_semantic_seg', 'img_metas'}
    assert out['img'].dtype == np.float32
    assert out['gt_semantic_seg'].dtype == np.int32
