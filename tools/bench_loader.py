"""Benchmark the three dataloader augmentation backends.

The reference's input pipeline is torch ``DataLoader`` workers running the
python transform chain per sample (ref ``mmseg/datasets/builder.py:78-152``);
its hot-loop bottleneck note is SURVEY §3.1 (3). This framework offers three
backends behind one ``build_dataloader(loader_backend=...)`` switch:

* ``host``   — per-sample python/cv2 pipeline on the prefetch thread pool
               (the parity path; same op semantics as the reference).
* ``native`` — raw decode on the thread pool, then ONE OpenMP batch call
               into the C++ core (``native/fastaug.cpp``) for the whole
               Resize/RandomCrop/Flip/PhotoMetric/Normalize chain.
* ``device`` — host decode + fixed canvas; augmentation as one jitted XLA
               program per batch on the accelerator.

This tool synthesizes a dataset of ``--num-images`` JPEG/PNG pairs at
``--size``, runs each backend through the same augmentation recipe
(scale-jitter 0.5-2.0 -> 512x512 crop with cat_max_ratio -> flip ->
photometric -> normalize) and reports imgs/s per backend as JSON lines.

Usage::

    python tools/bench_loader.py [--size 1024x512] [--batch 8]
        [--batches 4] [--workers N] [--backends host,native,device]

Results + the default-policy discussion live in docs/perf.md
("Loader backends").
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NORM = dict(mean=[123.675, 116.28, 103.53],
            std=[58.395, 57.12, 57.375], to_rgb=True)


def make_dataset_dir(root, n, hw):
    import cv2
    h, w = hw
    os.makedirs(os.path.join(root, 'img'), exist_ok=True)
    os.makedirs(os.path.join(root, 'ann'), exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        # low-frequency content so the JPEGs are realistically sized
        base = rs.randint(0, 255, (h // 16, w // 16, 3), np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
        noise = rs.randint(0, 24, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, 'img', f's{i}.jpg'),
                    cv2.add(img, noise))
        seg = cv2.resize(rs.randint(0, 19, (h // 32, w // 32), np.uint8),
                         (w, h), interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(os.path.join(root, 'ann', f's{i}.png'), seg)


def build(root, hw, crop, backend, batch, workers):
    from segdistill_tpu.datasets import build_dataloader, build_dataset
    h, w = hw
    img_scale = (w, h)  # pipeline convention: (w, h)
    aug = dict(crop_size=crop, img_scale=img_scale,
               ratio_range=(0.5, 2.0), cat_max_ratio=0.75)
    ds = build_dataset(dict(
        type='CustomDataset', img_dir=os.path.join(root, 'img'),
        ann_dir=os.path.join(root, 'ann'), img_suffix='.jpg',
        seg_map_suffix='.png',
        classes=tuple(f'c{i}' for i in range(19)),
        palette=[[i] * 3 for i in range(19)],
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='Resize', img_scale=img_scale,
                 ratio_range=(0.5, 2.0)),
            dict(type='RandomCrop', crop_size=crop, cat_max_ratio=0.75),
            dict(type='RandomFlip', prob=0.5),
            dict(type='PhotoMetricDistortion'),
            dict(type='Normalize', **NORM),
            dict(type='Pad', size=crop, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg']),
        ]))
    kwargs = dict(dist=False, num_gpus=1, shuffle=True, seed=3,
                  drop_last=True, loader_backend=backend)
    if backend == 'native':
        kwargs['aug_cfg'] = dict(aug)
    elif backend == 'device':
        # canvas = the ratio-1.0 rescale bound (h, w); scale jitter and
        # crop happen on-device from this fixed shape
        kwargs['aug_cfg'] = dict(aug, canvas=(h, w))
    return build_dataloader(ds, batch, workers, **kwargs)


def run_backend(backend, args, hw, crop, root):
    loader = build(root, hw, crop, backend, args.batch, args.workers)
    it = iter(loader)
    fence = lambda b: (np.asarray(b['img']),
                       np.asarray(b['gt_semantic_seg']))
    fence(next(it))  # warmup: thread pool spin-up + (device) jit compile
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.batches):
        img, _ = fence(next(it))
        n += img.shape[0]
    dt = time.perf_counter() - t0
    if hasattr(it, 'close'):
        it.close()  # generator close -> producer thread stop
    return dict(backend=backend, imgs_per_s=round(n / dt, 1),
                ms_per_img=round(1e3 * dt / n, 2), images=n,
                seconds=round(dt, 2))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--size', default='1024x512',
                    help='source image size WxH (default 1024x512)')
    ap.add_argument('--crop', type=int, default=512)
    ap.add_argument('--num-images', type=int, default=16)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--batches', type=int, default=4,
                    help='timed batches after 1 warmup batch')
    ap.add_argument('--workers', type=int,
                    default=min(8, os.cpu_count() or 1))
    ap.add_argument('--backends', default='host,native,device')
    ap.add_argument('--root', default=None,
                    help='reuse an existing synthesized dataset dir')
    args = ap.parse_args()

    w, h = (int(v) for v in args.size.split('x'))
    crop = (args.crop, args.crop)
    root = args.root or tempfile.mkdtemp(prefix='loaderbench_')
    if not os.path.isdir(os.path.join(root, 'img')):
        make_dataset_dir(root, args.num_images, (h, w))
    print(f'# dataset: {args.num_images} x {w}x{h} at {root}; '
          f'crop {crop}, batch {args.batch}, workers {args.workers}, '
          f'cpus {os.cpu_count()}', file=sys.stderr)

    results = []
    for backend in args.backends.split(','):
        backend = backend.strip()
        if backend == 'native':
            from segdistill_tpu.native import fastaug_available
            if not fastaug_available():
                print(json.dumps(dict(backend='native',
                                      skipped='toolchain unavailable')))
                continue
        try:
            res = run_backend(backend, args, (h, w), crop, root)
        except Exception as e:  # keep benchmarking the other backends
            res = dict(backend=backend, error=f'{type(e).__name__}: {e}')
        results.append(res)
        print(json.dumps(res), flush=True)

    ok = [r for r in results if 'imgs_per_s' in r]
    if ok:
        best = max(ok, key=lambda r: r['imgs_per_s'])
        print(json.dumps(dict(best=best['backend'],
                              imgs_per_s=best['imgs_per_s'])))


if __name__ == '__main__':
    main()
