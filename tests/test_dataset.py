"""Dataset/builder/dataloader tests
(ref strategy: tests/test_data/test_dataset*.py)."""

import os
import os.path as osp

import numpy as np
import pytest

from segdistill_tpu.datasets import (ConcatDataset, RepeatDataset,
                                     build_dataloader, build_dataset)
from segdistill_tpu.datasets.builder import DATASETS


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
