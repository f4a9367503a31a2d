"""Checkpoint save/resume round trip (ref contract: resume semantics,
apis/train.py:129-136 — schedules must survive resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.engine import (build_lr_schedule, build_optimizer,
                                   build_train_step, create_train_state,
                                   load_checkpoint, load_meta, load_weights,
                                   resume_latest, save_checkpoint)
from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

NORM = dict(type='BN')


def _model():
    return build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b0'),
        decode_head=dict(type='SegFormerHead',
                         in_channels=[32, 64, 160, 256],
                         in_index=[0, 1, 2, 3],
                         feature_strides=[4, 8, 16, 32], channels=32,
                         dropout_ratio=0.0, num_classes=5, norm_cfg=NORM,
                         align_corners=False,
                         decoder_params=dict(embed_dim=32))),
        train_cfg=dict(), test_cfg=dict(mode='whole'))


def test_save_restore_roundtrip(tmp_path):
    model = _model()
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    lr = build_lr_schedule(dict(policy='poly', power=1.0), 1e-3, 100)
    tx = build_optimizer(dict(type='AdamW', lr=1e-3, weight_decay=0.01),
                         variables['params'], lr)
    state = create_train_state(jax.random.key(1), variables, tx)
    step_fn = build_train_step(model, tx, lr, donate=False)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.randint(0, 5, (2, 32, 32)), jnp.int32)

    for _ in range(3):
        state, _ = step_fn(state, {}, img, gt)
    save_checkpoint(str(tmp_path), state, max_keep=2)

    # continue two more steps from the live state
    cont = state
    for _ in range(2):
        cont, logs_live = step_fn(cont, {}, img, gt)

    # restore and continue the same two steps
    restored = load_checkpoint(str(tmp_path), state)
    assert int(restored.step) == 3
    for _ in range(2):
        restored, logs_resumed = step_fn(restored, {}, img, gt)

    # identical trajectories (params, loss) — schedules are step-pure
    np.testing.assert_allclose(float(logs_live['loss']),
                               float(logs_resumed['loss']), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # ---- path flexibility: the single orbax step dir loads too (the
    # reference's --resume-from names a checkpoint *file*) ----
    import os.path as osp
    step_dir = osp.join(str(tmp_path), 'checkpoints', '3')
    assert osp.isdir(step_dir)
    from_step_dir = load_checkpoint(step_dir, state)
    assert int(from_step_dir.step) == 3

    # ---- load_weights: weights-only warm start (ref apis/train.py:
    # 134-135) — params restored, step/opt_state stay fresh ----
    fresh = create_train_state(
        jax.random.key(2), model.init_variables(jax.random.key(3),
                                                (1, 32, 32, 3)), tx)
    warm = load_weights(str(tmp_path), fresh)
    assert int(warm.step) == 0
    for a, b in zip(jax.tree.leaves(warm.params),
                    jax.tree.leaves(from_step_dir.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state is the fresh one, not the checkpoint's
    for a, b in zip(jax.tree.leaves(warm.opt_state),
                    jax.tree.leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ---- strict resume raises on a missing checkpoint; forgiving
    # auto-resume returns the state unchanged ----
    missing = str(tmp_path / 'nope')
    with pytest.raises(FileNotFoundError):
        resume_latest(missing, fresh, strict=True)
    same, resumed = resume_latest(missing, fresh)
    assert not resumed and same is fresh


def test_checkpoint_meta_roundtrip(tmp_path):
    """Meta sidecar: version/config/CLASSES/PALETTE stamped and read back
    (ref tools/train.py:145-153, tools/test.py:131-135)."""
    model = _model()
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    lr = build_lr_schedule(dict(policy='poly', power=1.0), 1e-3, 100)
    tx = build_optimizer(dict(type='SGD', lr=1e-3), variables['params'], lr)
    state = create_train_state(jax.random.key(1), variables, tx)

    meta = dict(segdistill_tpu_version='0.1.0', config='model = dict(...)',
                CLASSES=['road', 'car'], PALETTE=[[0, 0, 0], [1, 2, 3]])
    save_checkpoint(str(tmp_path), state, meta=meta)

    for probe in (str(tmp_path), str(tmp_path / 'checkpoints'),
                  str(tmp_path / 'checkpoints' / '0')):
        got = load_meta(probe)
        assert got is not None, probe
        assert got['CLASSES'] == ['road', 'car']
        assert got['PALETTE'] == [[0, 0, 0], [1, 2, 3]]
        assert got['iter'] == 0
    assert load_meta(str(tmp_path / 'absent')) is None
