"""Selectable dataloader augmentation backends (VERDICT r2, Next #8):
'host' (per-sample python pipeline), 'native' (C++ batch core),
'device' (jitted on-device pipeline) behind one ``build_dataloader``
switch."""

import numpy as np
import pytest

from segdistill_tpu.datasets import build_dataloader, build_dataset

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

CROP = (32, 32)
AUG = dict(crop_size=CROP, img_scale=(64, 48), ratio_range=(0.8, 1.2),
           cat_max_ratio=0.9)


@pytest.fixture(scope='module')
def pseudo(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('backend_data')
    (root / 'img').mkdir()
    (root / 'ann').mkdir()
    rs = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(str(root / 'img' / f's{i}.jpg'),
                    rs.randint(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(root / 'ann' / f's{i}.png'),
                    rs.randint(0, 5, (48, 64)).astype(np.uint8))
    return root


def _dataset(root):
    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
    return build_dataset(dict(
        type='CustomDataset', img_dir=str(root / 'img'),
        ann_dir=str(root / 'ann'), img_suffix='.jpg',
        seg_map_suffix='.png', classes=tuple('abcde'),
        palette=[[i] * 3 for i in range(5)],
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations'),
            dict(type='Resize', img_scale=(64, 48),
                 ratio_range=(0.8, 1.2)),
            dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.9),
            dict(type='RandomFlip', prob=0.5),
            dict(type='PhotoMetricDistortion'),
            dict(type='Normalize', **norm),
            dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg']),
        ]))


def _first_batches(loader, n=2):
    out = []
    it = iter(loader)
    for _ in range(n):
        b = next(it)
        out.append({'img': np.asarray(b['img']),
                    'gt': np.asarray(b['gt_semantic_seg'])})
    return out


@pytest.mark.parametrize('backend', ['host', 'native', 'device'])
def test_backend_contract(pseudo, backend):
    """Every backend yields the same batch contract: normalized f32 NHWC
    crops + int GT with only valid labels / ignore, deterministically by
    seed."""
    if backend == 'native':
        from segdistill_tpu.native import fastaug_available
        if not fastaug_available():
            pytest.skip('native toolchain unavailable')
    kwargs = dict(dist=False, num_gpus=1, shuffle=True, seed=3,
                  drop_last=True, loader_backend=backend)
    if backend == 'native':
        kwargs['aug_cfg'] = dict(AUG)
    elif backend == 'device':
        kwargs['aug_cfg'] = dict(AUG, canvas=(48, 64))
    batches = _first_batches(build_dataloader(_dataset(pseudo), 2, 2,
                                              **kwargs))
    for b in batches:
        assert b['img'].shape == (2, *CROP, 3)
        assert b['img'].dtype == np.float32
        assert b['gt'].shape == (2, *CROP)
        assert b['gt'].dtype in (np.int32, np.int64)
        labels = set(np.unique(b['gt']).tolist())
        assert labels <= set(range(5)) | {255}, labels
        # normalized pixels live in a few-sigma band
        assert np.all(np.abs(b['img']) < 8.0)

    # same seed -> identical stream (per-backend determinism)
    again = _first_batches(build_dataloader(_dataset(pseudo), 2, 2,
                                            **kwargs))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a['img'], b['img'])
        np.testing.assert_array_equal(a['gt'], b['gt'])


def test_unknown_backend_rejected(pseudo):
    with pytest.raises(ValueError, match='loader_backend'):
        build_dataloader(_dataset(pseudo), 2, 2, dist=False,
                         loader_backend='gpu')


def test_nonload_pipeline_rejected(pseudo):
    """native/device backends need a Load-only view; a pipeline missing
    LoadAnnotations fails loudly."""
    ds = build_dataset(dict(
        type='CustomDataset', img_dir=str(pseudo / 'img'),
        ann_dir=str(pseudo / 'ann'), img_suffix='.jpg',
        seg_map_suffix='.png', classes=tuple('abcde'),
        palette=[[i] * 3 for i in range(5)], test_mode=True,
        pipeline=[dict(type='LoadImageFromFile')]))
    with pytest.raises(ValueError, match='LoadAnnotations'):
        build_dataloader(ds, 2, 2, dist=False, shuffle=True,
                         loader_backend='device', aug_cfg=dict(AUG))


def test_bench_loader_tool(pseudo, monkeypatch, capsys, tmp_path):
    """tools/bench_loader.py end-to-end on the host backend (tiny data):
    emits one JSON line per backend + a best-of summary."""
    import json
    import sys

    sys.modules.pop('bench_loader', None)
    import importlib
    spec = importlib.util.spec_from_file_location(
        'bench_loader', 'tools/bench_loader.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, 'argv', [
        'bench_loader.py', '--backends', 'host', '--size', '64x48',
        '--num-images', '6', '--batch', '2', '--batches', '2',
        '--workers', '1', '--root', str(tmp_path)])
    mod.main()
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]['backend'] == 'host'
    assert lines[0]['imgs_per_s'] > 0
    assert lines[-1]['best'] == 'host'
