#!/usr/bin/env python
"""Benchmark the dataloader augmentation backends (host | native | device).

Generates a synthetic on-disk dataset (ADE-like source sizes) and measures
sustained imgs/s per backend through the production ``build_dataloader``.
Run on a real multi-core TPU-VM host for meaningful numbers — the CI
container is 1-core, where the thread pool and the OpenMP core cannot
stretch their legs.

    python tools/benchmark_loader.py --backends host native device \
        --num-images 64 --batch 8 --iters 30
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def make_dataset_dir(root, n, size=(512, 683)):
    import cv2
    os.makedirs(f'{root}/img', exist_ok=True)
    os.makedirs(f'{root}/ann', exist_ok=True)
    rs = np.random.RandomState(0)
    h, w = size
    for i in range(n):
        cv2.imwrite(f'{root}/img/s{i}.jpg',
                    rs.randint(0, 255, (h, w, 3), np.uint8))
        cv2.imwrite(f'{root}/ann/s{i}.png',
                    rs.randint(0, 150, (h, w)).astype(np.uint8))


def build(root, backend, batch, workers, crop):
    from segdistill_tpu.datasets import build_dataloader, build_dataset
    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
    dataset = build_dataset(dict(
        type='CustomDataset', img_dir=f'{root}/img', ann_dir=f'{root}/ann',
        img_suffix='.jpg', seg_map_suffix='.png',
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='Resize', img_scale=(2048, 512),
                 ratio_range=(0.5, 2.0)),
            dict(type='RandomCrop', crop_size=crop, cat_max_ratio=0.75),
            dict(type='RandomFlip', prob=0.5),
            dict(type='PhotoMetricDistortion'),
            dict(type='Normalize', **norm),
            dict(type='Pad', size=crop, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg']),
        ]))
    aug_cfg = None
    if backend == 'native':
        aug_cfg = dict(crop_size=crop)
    elif backend == 'device':
        aug_cfg = dict(crop_size=crop, canvas=(512, 2048))
    return build_dataloader(dataset, batch, workers, dist=False,
                            num_gpus=1, shuffle=True, seed=0,
                            loader_backend=backend, aug_cfg=aug_cfg)


def measure(loader, iters, warmup=3):
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    n = 0
    t0 = time.perf_counter()
    for _ in range(iters):
        b = next(it)
        n += np.asarray(b['img']).shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backends', nargs='+',
                    default=['host', 'native', 'device'])
    ap.add_argument('--num-images', type=int, default=64)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--workers', type=int, default=os.cpu_count() or 4)
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--crop', type=int, nargs=2, default=[512, 512])
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='loaderbench_')
    make_dataset_dir(root, args.num_images)
    crop = tuple(args.crop)
    print(f'{os.cpu_count()} cores, batch {args.batch}, '
          f'workers {args.workers}, crop {crop}')
    for backend in args.backends:
        try:
            loader = build(root, backend, args.batch, args.workers, crop)
            rate = measure(loader, args.iters)
            print(f'{backend:>7}: {rate:8.1f} imgs/s')
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f'{backend:>7}: FAILED ({type(e).__name__}: {e})')


if __name__ == '__main__':
    main()
