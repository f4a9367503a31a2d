"""SDModule / SDModuleMT behavior tests (ref: SD_structure.py contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

NORM = dict(type='BN')


def _enc(bb, in_ch, embed, num_classes=19):
    return dict(type='EncoderDecoder',
                backbone=dict(type=bb, style='pytorch'),
                decode_head=dict(
                    type='SegFormerHead', in_channels=in_ch,
                    in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
                    channels=64, dropout_ratio=0.1,
                    num_classes=num_classes, norm_cfg=NORM,
                    align_corners=False,
                    decoder_params=dict(embed_dim=embed)))


def test_multi_teacher_aligned_path():
    cfg = dict(type='SDModuleMT',
               cfg_s=_enc('mit_b0', [32, 64, 160, 256], 64),
               cfg_t=[_enc('mit_b0', [32, 64, 160, 256], 64),
                      _enc('mit_b1', [64, 128, 320, 512], 64)],
               distillation=[
                   {'student_layer': 'decode_head.linear_pred',
                    'teacher_layer': 'decode_head.linear_pred',
                    'loss_name': 'PDLoss', 'loss_config': {}},
                   {'student_layer': 'decode_head.linear_pred',
                    'teacher_layer': 'decode_head.linear_pred',
                    'loss_name': 'CDLoss', 'loss_config': {}},
               ],
               train_cfg=dict(), test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _ = model.forward_train(
        variables['student'], variables['teachers'], img, gt, step=1,
        rngs={'dropout': jax.random.key(1)})
    # entry i reads teacher i's tap: name suffixed with the index
    # (ref opts.py:153-157, 198-208)
    keys = sorted(k for k in losses if '<->' in k)
    assert any(k.endswith('linear_pred0_other') or 'linear_pred0' in k
               for k in keys), keys
    assert any('linear_pred1' in k for k in keys), keys
    pred = model.simple_test(variables['student'], img)
    assert pred.shape == (1, 32, 32)


def test_teacher_gets_no_gradient():
    cfg = dict(type='SDModule',
               cfg_s=_enc('mit_b0', [32, 64, 160, 256], 64),
               cfg_t=_enc('mit_b1', [64, 128, 320, 512], 64),
               distillation=[{'student_layer': 'decode_head.linear_pred',
                              'teacher_layer': 'decode_head.linear_pred',
                              'loss_name': 'CGDLoss',
                              'loss_config': {'group_size': 5}}],
               train_cfg=dict(), test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                      jnp.float32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)

    def loss_wrt_teacher(tparams):
        tv = dict(variables['teacher'])
        tv['params'] = tparams
        losses, _ = model.forward_train(
            variables['student'], tv, img, gt, step=1,
            rngs={'dropout': jax.random.key(1)})
        from segdistill_tpu.models.segmentors import parse_losses
        return parse_losses(losses)[0]

    g = jax.grad(loss_wrt_teacher)(variables['teacher']['params'])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert total == 0.0  # stop_gradient wall (ref: requires_grad=False)


def test_distill_loss_scheduling_changes_with_step():
    cfg = dict(type='SDModule',
               cfg_s=_enc('mit_b0', [32, 64, 160, 256], 64),
               cfg_t=_enc('mit_b1', [64, 128, 320, 512], 64),
               distillation=[{'student_layer': 'decode_head.linear_pred',
                              'teacher_layer': 'decode_head.linear_pred',
                              'loss_name': 'CGDLossWS',
                              'loss_config': {}}],
               train_cfg=dict(), test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                      jnp.float32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)

    def dloss(step):
        losses, _ = model.forward_train(
            variables['student'], variables['teacher'], img, gt, step=step,
            rngs={'dropout': jax.random.key(1)})
        key = [k for k in losses if '<->' in k][0]
        return float(losses[key])

    # warmup: alpha(500)/alpha(1500) = 1/3 (both non-shuffle steps —
    # CGDLossWS reshuffles every 1000 steps, changing the grouping)
    assert dloss(500) == pytest.approx(dloss(1500) / 3.0, rel=1e-4)
    # early-decay end: zero
    assert dloss(130001) == 0.0


def test_sdmodule_mt_random_ensemble():
    """One entry + many teachers -> the reference's 'random' dispatch
    (opts.py:186-197): per-step random teacher, loss key 'loss_random'."""
    from segdistill_tpu.models import build_segmentor
    from segdistill_tpu.models.segmentors import parse_losses

    def enc(depth):
        return dict(type='EncoderDecoder',
                    backbone=dict(type='ResNet', depth=depth, num_stages=4,
                                  out_indices=(0, 1, 2, 3),
                                  norm_cfg=dict(type='BN')),
                    decode_head=dict(
                        type='FCNHead', in_channels=512, in_index=3,
                        channels=16, num_convs=1, concat_input=False,
                        dropout_ratio=0.0, num_classes=5,
                        norm_cfg=dict(type='BN'), align_corners=False))

    model = build_segmentor(dict(
        type='SDModuleMT',
        cfg_s=enc(18),
        cfg_t=[enc(18), enc(18)],
        distillation=[dict(student_layer='decode_head.conv_seg',
                           teacher_layer='decode_head.conv_seg',
                           loss_name='CGDLoss',
                           loss_config=dict(group_size=1, alpha=1,
                                            tau=1))]))
    assert model.random_ensemble
    v = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _ = model.forward_train(
        v['student'], v['teachers'], img, gt, 3,
        rngs={'dropout': jax.random.key(1)},
        shuffle_rng=jax.random.key(2))
    assert 'loss_random' in losses
    total, log_vars = parse_losses(losses)
    assert np.isfinite(float(total))


def test_cross_architecture_taps():
    """exp_tab5 psp_CGD contract (ref local_configs/exp_tab5/psp_CGD.py:
    54-67): a CNN student taps 'decode_head.conv_seg' while the MiT
    teacher taps 'decode_head.linear_pred' — different tap names AND
    logits produced by structurally unrelated heads."""
    model = build_segmentor(dict(
        type='SDModule',
        cfg_s=dict(
            type='EncoderDecoder',
            backbone=dict(type='ResNet', depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3),
                          norm_cfg=dict(type='BN')),
            decode_head=dict(
                type='FCNHead', in_channels=512, in_index=3, channels=16,
                num_convs=1, concat_input=False, dropout_ratio=0.0,
                num_classes=19, norm_cfg=dict(type='BN'),
                align_corners=False)),
        cfg_t=_enc('mit_b0', [32, 64, 160, 256], 64, num_classes=19),
        distillation=[dict(student_layer='decode_head.conv_seg',
                           teacher_layer='decode_head.linear_pred',
                           loss_name='CGDLoss',
                           loss_config=dict(group_size=10, alpha=3,
                                            tau=2))]))
    v = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                      jnp.float32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _ = model.forward_train(
        v['student'], v['teacher'], img, gt, step=1,
        rngs={'dropout': jax.random.key(1)},
        shuffle_rng=jax.random.key(2))
    from segdistill_tpu.models.segmentors import parse_losses
    key = 'loss_decode_head.conv_seg<->decode_head.linear_pred_other'
    assert key in losses, sorted(losses)
    total, _ = parse_losses(losses)
    assert np.isfinite(float(total)) and float(losses[key]) > 0
