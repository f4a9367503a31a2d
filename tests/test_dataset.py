"""Dataset/builder/dataloader tests
(ref strategy: tests/test_data/test_dataset*.py)."""

import os
import os.path as osp

import numpy as np
import pytest

from segdistill_tpu.datasets import (ConcatDataset, RepeatDataset,
                                     build_dataloader, build_dataset)
from segdistill_tpu.datasets.builder import DATASETS, DataLoader


@DATASETS.register_module(name='ToyDataset', force=True)
class ToyDataset:
    CLASSES = ('a', 'b')
    PALETTE = [[0, 0, 0], [255, 255, 255]]

    def __init__(self, cnt=10, pipeline=None):
        self.cnt = cnt

    def __len__(self):
        return self.cnt

    def __getitem__(self, idx):
        return {'img': np.full((4, 4, 3), idx, np.float32),
                'gt_semantic_seg': np.full((4, 4), idx % 2, np.int32),
                'img_metas': {'idx': idx}}


def test_build_dataset_wrappers():
    ds = build_dataset(dict(type='RepeatDataset', times=3,
                            dataset=dict(type='ToyDataset', cnt=4)))
    assert isinstance(ds, RepeatDataset) and len(ds) == 12
    assert float(ds[5]['img'][0, 0, 0]) == 1.0  # 5 % 4

    ds2 = build_dataset([dict(type='ToyDataset', cnt=4),
                         dict(type='ToyDataset', cnt=6)])
    assert isinstance(ds2, ConcatDataset) and len(ds2) == 10
    assert ds2[4]['img_metas']['idx'] == 0  # first of the second dataset


def test_dataloader_batching_and_determinism():
    ds = build_dataset(dict(type='ToyDataset', cnt=16))
    loader = build_dataloader(ds, samples_per_gpu=4, workers_per_gpu=1,
                              dist=False, shuffle=True, seed=7,
                              process_index=0, process_count=1)
    it = iter(loader)
    b1 = [next(it) for _ in range(3)]
    it2 = iter(loader)
    b2 = [next(it2) for _ in range(3)]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x['img'], y['img'])
    assert b1[0]['img'].shape[0] == 4
    assert len(b1[0]['img_metas']) == 4


def test_dataloader_host_sharding():
    ds = build_dataset(dict(type='ToyDataset', cnt=16))
    seen = {}
    for rank in (0, 1):
        loader = build_dataloader(ds, samples_per_gpu=2,
                                  workers_per_gpu=1, dist=False,
                                  shuffle=True, seed=7,
                                  process_index=rank, process_count=2)
        batch = next(iter(loader))
        seen[rank] = {m['idx'] for m in batch['img_metas']}
    # the two hosts take disjoint slices of the same global batch
    assert seen[0].isdisjoint(seen[1])


def test_eval_loader_single_pass():
    ds = build_dataset(dict(type='ToyDataset', cnt=5))
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=1,
                              dist=False, shuffle=False, drop_last=False,
                              process_index=0, process_count=1)
    batches = list(iter(loader))
    total = sum(b['img'].shape[0] for b in batches)
    assert total == 5  # drop_last off for eval


def test_custom_dataset_scan_and_evaluate(tmp_path):
    import cv2
    img_dir = tmp_path / 'img'
    ann_dir = tmp_path / 'ann'
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.RandomState(0)
    gts = []
    for i in range(3):
        cv2.imwrite(str(img_dir / f's{i}.jpg'),
                    rng.randint(0, 255, (8, 8, 3), np.uint8))
        gt = rng.randint(0, 2, (8, 8)).astype(np.uint8)
        cv2.imwrite(str(ann_dir / f's{i}.png'), gt)
        gts.append(gt)
    ds = build_dataset(dict(
        type='CustomDataset', img_dir=str(img_dir), ann_dir=str(ann_dir),
        img_suffix='.jpg', seg_map_suffix='.png',
        classes=('bg', 'fg'), palette=[[0, 0, 0], [1, 1, 1]],
        pipeline=[dict(type='LoadImageFromFile'),
                  dict(type='LoadAnnotations'),
                  dict(type='DefaultFormatBundle'),
                  dict(type='Collect', keys=['img', 'gt_semantic_seg'])]))
    assert len(ds) == 3
    sample = ds[0]
    assert sample['img'].shape == (8, 8, 3)
    # perfect predictions -> mIoU 1.0
    res = ds.evaluate(gts, metric='mIoU')
    assert res['mIoU'] == pytest.approx(1.0)
    assert res['aAcc'] == pytest.approx(1.0)


def _aug_dataset(tmp_path, n=8):
    import cv2
    img_dir = tmp_path / 'img'
    ann_dir = tmp_path / 'ann'
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.RandomState(7)
    for i in range(n):
        cv2.imwrite(str(img_dir / f's{i}.jpg'),
                    rng.randint(0, 255, (33 + i, 41, 3), np.uint8))
        cv2.imwrite(str(ann_dir / f's{i}.png'),
                    rng.randint(0, 4, (33 + i, 41)).astype(np.uint8))
    return build_dataset(dict(
        type='CustomDataset', img_dir=str(img_dir), ann_dir=str(ann_dir),
        img_suffix='.jpg', seg_map_suffix='.png',
        classes=('a', 'b', 'c', 'd'),
        palette=[[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]],
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='Resize', img_scale=(64, 32), ratio_range=(0.5, 2.0)),
            dict(type='RandomCrop', crop_size=(24, 24), cat_max_ratio=0.75),
            dict(type='RandomFlip', prob=0.5),
            dict(type='PhotoMetricDistortion'),
            dict(type='Pad', size=(24, 24), pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg'])]))


def test_loader_deterministic_with_concurrent_workers(tmp_path):
    """Same seed -> bitwise-identical batches, with workers>1, twice
    (VERDICT round-1 item 2: the per-sample RNG replaces racy global
    np.random.seed in pool threads; ref contract builder.py:155-169)."""
    ds = _aug_dataset(tmp_path)

    def first_batches(workers):
        loader = DataLoader(ds, samples_per_gpu=4, num_workers=workers,
                            shuffle=True, seed=11, process_index=0,
                            process_count=1)
        it = iter(loader)
        return [next(it) for _ in range(6)]

    a = first_batches(workers=4)
    b = first_batches(workers=4)
    c = first_batches(workers=1)  # worker count must not change the data
    for ba, bb, bc in zip(a, b, c):
        np.testing.assert_array_equal(ba['img'], bb['img'])
        np.testing.assert_array_equal(ba['gt_semantic_seg'],
                                      bb['gt_semantic_seg'])
        np.testing.assert_array_equal(ba['img'], bc['img'])
    # augmentation streams are independent per sample: with photometric
    # distortion + random crops, identical rows would mean seed reuse
    flat = a[0]['img'].reshape(4, -1)
    assert not any(np.array_equal(flat[i], flat[j])
                   for i in range(4) for j in range(i + 1, 4))


def test_loader_different_seed_differs(tmp_path):
    ds = _aug_dataset(tmp_path)

    def batch0(seed):
        loader = DataLoader(ds, samples_per_gpu=4, num_workers=2,
                            shuffle=True, seed=seed, process_index=0,
                            process_count=1)
        return next(iter(loader))

    assert not np.array_equal(batch0(1)['img'], batch0(2)['img'])


def test_loader_rejects_dataset_smaller_than_global_batch():
    """drop_last with dataset < global batch would otherwise make the
    producer spin through empty epochs forever (found via a hung CLI
    e2e run under the 8-virtual-device test env)."""
    from segdistill_tpu.datasets.builder import DataLoader

    class Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {'img': np.zeros((2, 2, 3), np.float32)}

    loader = DataLoader(Tiny(), samples_per_gpu=4, num_workers=1,
                        shuffle=True, seed=0, drop_last=True,
                        process_index=0, process_count=2)
    with pytest.raises(ValueError, match='global batch'):
        iter(loader)
