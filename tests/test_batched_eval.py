"""Shape-grouped batched eval must reproduce per-image results."""

import numpy as np
import pytest

from segdistill_tpu.apis.test import single_device_test
from segdistill_tpu.datasets import build_dataset
from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def pseudo(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('pseudo')
    (root / 'img').mkdir()
    (root / 'ann').mkdir()
    rng = np.random.RandomState(0)
    # two distinct source sizes -> two shape groups after AlignedResize
    sizes = [(60, 90), (60, 90), (60, 90), (80, 60), (80, 60)]
    for i, (h, w) in enumerate(sizes):
        cv2.imwrite(str(root / 'img' / f's{i}.jpg'),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        cv2.imwrite(str(root / 'ann' / f's{i}.png'),
                    rng.randint(0, 5, (h, w)).astype(np.uint8))
    return root


def test_batched_matches_per_image(pseudo):
    import jax
    norm_img = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    dataset = build_dataset(dict(
        type='CustomDataset', img_dir=str(pseudo / 'img'),
        ann_dir=str(pseudo / 'ann'), img_suffix='.jpg',
        seg_map_suffix='.png', classes=tuple('abcde'),
        palette=[[i] * 3 for i in range(5)], test_mode=True,
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(96, 64), flip=False,
                 transforms=[
                     dict(type='AlignedResize', keep_ratio=True,
                          size_divisor=32),
                     dict(type='Normalize', **norm_img),
                     dict(type='ImageToTensor', keys=['img']),
                     dict(type='Collect', keys=['img']),
                 ])]))
    model = build_segmentor(dict(
        type='EncoderDecoder', backbone=dict(type='mit_b0'),
        decode_head=dict(type='SegFormerHead',
                         in_channels=[32, 64, 160, 256],
                         in_index=[0, 1, 2, 3],
                         feature_strides=[4, 8, 16, 32], channels=32,
                         dropout_ratio=0.0, num_classes=5,
                         norm_cfg=dict(type='BN'), align_corners=False,
                         decoder_params=dict(embed_dim=32))),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    per_image = single_device_test(model, variables, dataset,
                                   progress=False)
    batched = single_device_test(model, variables, dataset,
                                 progress=False, batch_size=2)
    assert len(per_image) == len(batched) == 5
    # batch-size changes XLA tiling -> fp noise flips argmax near-ties of
    # the random-init model; demand near-total agreement, not bit equality
    for a, b in zip(per_image, batched):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        agree = float(np.mean(a == b))
        assert agree > 0.97, agree


def test_tta_device_path_matches_host(pseudo):
    """TTA samples with a repeated view-shape signature take the device
    accumulate path in batched mode; it must agree with the host path."""
    import jax
    norm_img = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    dataset = build_dataset(dict(
        type='CustomDataset', img_dir=str(pseudo / 'img'),
        ann_dir=str(pseudo / 'ann'), img_suffix='.jpg',
        seg_map_suffix='.png', classes=tuple('abcde'),
        palette=[[i] * 3 for i in range(5)], test_mode=True,
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(96, 64),
                 img_ratios=[0.75, 1.0], flip=True,
                 transforms=[
                     dict(type='AlignedResize', keep_ratio=True,
                          size_divisor=32),
                     dict(type='RandomFlip'),
                     dict(type='Normalize', **norm_img),
                     dict(type='ImageToTensor', keys=['img']),
                     dict(type='Collect', keys=['img']),
                 ])]))
    model = build_segmentor(dict(
        type='EncoderDecoder', backbone=dict(type='mit_b0'),
        decode_head=dict(type='SegFormerHead',
                         in_channels=[32, 64, 160, 256],
                         in_index=[0, 1, 2, 3],
                         feature_strides=[4, 8, 16, 32], channels=32,
                         dropout_ratio=0.0, num_classes=5,
                         norm_cfg=dict(type='BN'), align_corners=False,
                         decoder_params=dict(embed_dim=32))),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    host = single_device_test(model, variables, dataset, progress=False)
    batched = single_device_test(model, variables, dataset,
                                 progress=False, batch_size=2)
    assert len(host) == len(batched) == 5
    for a, b in zip(host, batched):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        # device resize vs cv2 resize differ by fp rounding; near-ties of
        # the random-init model can flip — demand near-total agreement
        agree = float(np.mean(a == b))
        assert agree > 0.97, agree
