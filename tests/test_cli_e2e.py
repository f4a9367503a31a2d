"""CLI end-to-end: tools/train.py -> resume -> tools/test.py
(VERDICT r2, Missing #3 / Next #4).

The reference's entire user surface is ``dist_train.sh -> train.py ->
runner -> test.py`` (ref tools/train.py:63-163, test.py:66-166). This test
subprocesses the real CLIs on a generated pseudo dataset: 8 training
iterations of CGD distillation, checkpointing, a mid-training eval, a
RESUME continuing the step counter (the reference's ``model.cnt =
runner.iter`` semantics, ref apis/train.py:136 — our schedules are pure in
the step, so resume-correctness == the runner restoring ``state.step``),
and finally ``test.py --eval mIoU`` printing a per-class table.
"""

import os
import os.path as osp
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _make_pseudo(root):
    import cv2
    rs = np.random.RandomState(0)
    for split, n in (('train', 8), ('val', 3)):
        os.makedirs(f'{root}/img/{split}')
        os.makedirs(f'{root}/ann/{split}')
        for i in range(n):
            cv2.imwrite(f'{root}/img/{split}/s{i}.jpg',
                        rs.randint(0, 255, (64, 64, 3), np.uint8))
            # ADE-style: 0 = unlabeled (reduce_zero_label), 1..5 = classes
            cv2.imwrite(f'{root}/ann/{split}/s{i}.png',
                        rs.randint(0, 6, (64, 64)).astype(np.uint8))


def _write_config(path, root, work_dir):
    enc = """dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b0', drop_path_rate=0.0),
        decode_head=dict(
            type='SegFormerHead', in_channels=[32, 64, 160, 256],
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=32, dropout_ratio=0.1, num_classes=5,
            norm_cfg=dict(type='SyncBN', requires_grad=True),
            align_corners=False, decoder_params=dict(embed_dim=32)))"""
    ds = """dict(
        type='CustomDataset', data_root='{root}',
        img_dir='img/{split}', ann_dir='ann/{split}',
        img_suffix='.jpg', seg_map_suffix='.png',
        classes=('a', 'b', 'c', 'd', 'e'),
        palette=[[i * 40] * 3 for i in range(5)],
        reduce_zero_label=True, pipeline={pipe})"""
    cfg = textwrap.dedent(f"""
        img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375], to_rgb=True)
        crop_size = (64, 64)
        train_pipeline = [
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', reduce_zero_label=True),
            dict(type='Resize', img_scale=(64, 64), ratio_range=(0.75, 1.25)),
            dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.9),
            dict(type='RandomFlip', prob=0.5),
            dict(type='Normalize', **img_norm_cfg),
            dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg']),
        ]
        test_pipeline = [
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
                 transforms=[
                     dict(type='AlignedResize', keep_ratio=True,
                          size_divisor=32),
                     dict(type='Normalize', **img_norm_cfg),
                     dict(type='ImageToTensor', keys=['img']),
                     dict(type='Collect', keys=['img']),
                 ])]
        model = dict(
            type='SDModule',
            cfg_s={enc},
            cfg_t={enc},
            distillation=[dict(student_layer='decode_head.linear_pred',
                               teacher_layer='decode_head.linear_pred',
                               loss_name='CGDLoss',
                               loss_config=dict(group_size=2, alpha=3,
                                                tau=2))],
            train_cfg=dict(), test_cfg=dict(mode='whole'))
        data = dict(
            samples_per_gpu=2, workers_per_gpu=2,
            train={ds.format(root=root, split='train',
                             pipe='train_pipeline')},
            val={ds.format(root=root, split='val', pipe='test_pipeline')},
            test={ds.format(root=root, split='val', pipe='test_pipeline')})
        optimizer = dict(type='SGD', lr=0.01, momentum=0.9,
                         weight_decay=0.0005)
        lr_config = dict(policy='poly', power=1.0, min_lr=1e-4,
                         by_epoch=False)
        runner = dict(type='IterBasedRunner', max_iters=8)
        checkpoint_config = dict(interval=4, max_keep_ckpts=2)
        evaluation = dict(interval=4, metric='mIoU')
        log_config = dict(interval=2, hooks=[dict(type='TextLoggerHook')])
        work_dir = '{work_dir}'
        workflow = [('train', 1)]
        """)
    with open(path, 'w') as f:
        f.write(cfg)


def _run_cli(script, *args, timeout=1500):
    """JAX_COMPILATION_CACHE_DIR must NOT be set on the CPU backend here:
    persisting CPU executables wedges the compile thread indefinitely on
    this box (observed: 25 min without finishing a 20 s compile). The
    cache is a TPU-run optimization only."""
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    # conftest exports an 8-virtual-device XLA_FLAGS for in-process mesh
    # tests; the CLI must see a plain 1-device host
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools', script), *args],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, (
        f'{script} failed:\nSTDOUT:{proc.stdout[-2000:]}\n'
        f'STDERR:{proc.stderr[-4000:]}')
    return proc.stdout + proc.stderr


def test_cli_train_resume_test(tmp_path):
    root = str(tmp_path / 'data')
    work = str(tmp_path / 'work')
    cfg_path = str(tmp_path / 'tiny_cgd.py')
    _make_pseudo(root)
    _write_config(cfg_path, root, work)

    # ---- phase 1: 8 iterations with mid-training eval + checkpoints ----
    out = _run_cli('train.py', cfg_path, '--work-dir', work, '--seed', '42')
    assert 'decode.loss_seg' in out
    assert 'linear_pred<->decode_head.linear_pred' in out  # distill key
    assert 'Eval at iter 4' in out
    assert 'Saved checkpoint at iter 8' in out
    assert osp.isdir(osp.join(work, 'checkpoints'))

    # checkpoint meta stamped next to the orbax step dirs
    # (ref tools/train.py:145-153)
    import json
    meta = json.load(open(osp.join(work, 'checkpoints', 'meta.json')))
    assert meta['CLASSES'] == ['a', 'b', 'c', 'd', 'e']
    assert len(meta['PALETTE']) == 5
    assert 'SDModule' in meta['config']
    assert meta['iter'] == 8

    # ---- phase 2: resume continues the step counter (and therefore the
    # step-keyed loss schedules: the ref model.cnt semantics) ----
    out2 = _run_cli('train.py', cfg_path, '--work-dir', work,
                    '--resume-from', work, '--seed', '42',
                    '--options', 'runner.max_iters=12')
    assert 'resumed from' in out2
    assert 'iter 8 -> 12' in out2, out2[-2000:]
    assert 'Saved checkpoint at iter 12' in out2

    # ---- phase 2b: --load-from = weights-only warm start (iter resets,
    # ref apis/train.py:134-135) — accepts the single orbax step dir too
    work2 = str(tmp_path / 'work_warm')
    step_dir = osp.join(work, 'checkpoints', '12')
    assert osp.isdir(step_dir)
    out2b = _run_cli('train.py', cfg_path, '--work-dir', work2,
                     '--seed', '42', '--load-from', step_dir,
                     '--options', 'runner.max_iters=2',
                     'evaluation.interval=99',
                     'checkpoint_config.interval=2')
    assert 'warm start, iter 0' in out2b
    assert 'iter 0 -> 2' in out2b, out2b[-2000:]

    # ---- phase 2c: explicit --resume-from a missing checkpoint fails
    # LOUDLY (no silent restart-at-0 of a long run) ----
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools', 'train.py'), cfg_path,
         '--work-dir', str(tmp_path / 'work_bad'),
         '--resume-from', str(tmp_path / 'nonexistent')],
        capture_output=True, text=True, timeout=1500, env=env)
    assert proc.returncode != 0
    assert 'no checkpoint found' in proc.stderr

    # ---- phase 3: test.py --eval mIoU prints a per-class table and reads
    # CLASSES/PALETTE back from the checkpoint meta (ref test.py:131-135)
    out3 = _run_cli('test.py', cfg_path, work, '--eval', 'mIoU')
    assert 'per class results' in out3
    assert 'mIoU' in out3
    assert 'read from checkpoint meta' in out3
    # all five classes present in the table
    for cls in ('a', 'b', 'c', 'd', 'e'):
        assert any(line.strip().startswith(cls)
                   for line in out3.splitlines()), f'class {cls} missing'


def test_cli_tta_slide_eval_bounded_compiles(tmp_path):
    """tools/test.py over a multi-scale + flip TTA pipeline in SLIDE mode
    (VERDICT r3 #8): the full TTA/slide eval path must run through the
    CLI on a mixed-size pseudo val set, and the number of XLA
    compilations must stay bounded by the distinct view shapes (the eval
    jit caches are LRU-bounded; ref tools/test.py:90-108,
    encoder_decoder.py:169-212)."""
    import cv2
    root = str(tmp_path / 'data')
    work = str(tmp_path / 'work')
    cfg_path = str(tmp_path / 'tiny_slide.py')
    rs = np.random.RandomState(1)
    for split, sizes in (('train', [(64, 64)] * 4),
                         ('val', [(64, 64), (96, 64), (64, 64)])):
        os.makedirs(f'{root}/img/{split}')
        os.makedirs(f'{root}/ann/{split}')
        for i, (h, w) in enumerate(sizes):
            cv2.imwrite(f'{root}/img/{split}/s{i}.jpg',
                        rs.randint(0, 255, (h, w, 3), np.uint8))
            cv2.imwrite(f'{root}/ann/{split}/s{i}.png',
                        rs.randint(0, 6, (h, w)).astype(np.uint8))
    _write_config(cfg_path, root, work)
    text = open(cfg_path).read()
    # slide inference + a 2-scale x flip TTA sweep
    text = text.replace("test_cfg=dict(mode='whole')",
                        "test_cfg=dict(mode='slide', crop_size=(48, 48), "
                        "stride=(32, 32))")
    text = text.replace(
        "dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,",
        "dict(type='MultiScaleFlipAug', img_scale=(64, 64), "
        "img_ratios=[0.5, 1.0], flip=True,")
    with open(cfg_path, 'w') as f:
        f.write(text)

    # train 2 iters just to produce a checkpoint for test.py
    _run_cli('train.py', cfg_path, '--work-dir', work, '--seed', '7',
             '--options', 'runner.max_iters=2', 'evaluation.interval=99',
             'checkpoint_config.interval=2')

    env_extra = {'JAX_LOG_COMPILES': '1', 'SEGDISTILL_EVAL_JIT_CACHE': '8'}
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO,
               **env_extra)
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools', 'test.py'), cfg_path,
         work, '--eval', 'mIoU'],
        capture_output=True, text=True, timeout=1500, env=env)
    assert proc.returncode == 0, (
        f'test.py failed:\nSTDOUT:{proc.stdout[-2000:]}\n'
        f'STDERR:{proc.stderr[-4000:]}')
    out = proc.stdout + proc.stderr
    assert 'mIoU' in out
    # distinct TTA view shapes: ori 64x64 -> aligned {32x32, 64x64},
    # ori 96x64 -> aligned {padded variants}; x {noflip, flip} shares
    # programs (flip-undo happens outside the net). Slide windows are
    # fixed-size crops. Model-inference compiles must stay within the
    # distinct-shape budget, not grow per image x per view.
    compiles = [ln for ln in proc.stderr.splitlines()
                if 'Finished XLA compilation' in ln]
    inference_compiles = [ln for ln in compiles if 'fn' in ln]
    assert len(compiles) <= 24, (len(compiles), compiles[:30])


def test_cli_benchmark_slide(tmp_path):
    """tools/benchmark.py dispatches slide inference from the config's
    test_cfg (the reference times the full inference path,
    ref benchmark.py:50-82; slide: encoder_decoder.py:169-212)."""
    root = str(tmp_path / 'data')
    work = str(tmp_path / 'work')
    cfg_path = str(tmp_path / 'tiny_bench.py')
    _make_pseudo(root)
    _write_config(cfg_path, root, work)
    text = open(cfg_path).read().replace(
        "test_cfg=dict(mode='whole')",
        "test_cfg=dict(mode='slide', crop_size=(48, 48), "
        "stride=(32, 32))")
    with open(cfg_path, 'w') as f:
        f.write(text)
    out = _run_cli('benchmark.py', cfg_path, '--iters', '4',
                   '--warmup', '1', '--shape', '64', '96',
                   '--log-interval', '2')
    assert 'Overall fps' in out


def test_cli_train_steps_per_dispatch(tmp_path):
    """Steps-per-loop decoupling through the real CLI: k=3 over
    max_iters=8 runs two 3-step scan dispatches plus a 2-step single tail,
    and interval hooks (log 2 / ckpt 4 / eval 4) fire on crossings."""
    root = str(tmp_path / 'data')
    work = str(tmp_path / 'work')
    cfg_path = str(tmp_path / 'tiny_cgd_spd.py')
    _make_pseudo(root)
    _write_config(cfg_path, root, work)

    out = _run_cli('train.py', cfg_path, '--work-dir', work, '--seed', '42',
                   '--options', 'runner.steps_per_dispatch=3')
    assert 'decode.loss_seg' in out
    assert 'linear_pred<->decode_head.linear_pred' in out
    # chunk boundaries 3, 6, 7, 8: eval interval 4 crosses at step 6,
    # ckpt interval 4 crosses at step 6, final ckpt at 8
    assert 'Eval at iter 6' in out
    assert 'Iter [8/8]' in out
    assert 'Saved checkpoint' in out

    import json
    meta = json.load(open(osp.join(work, 'checkpoints', 'meta.json')))
    assert meta['iter'] == 8
