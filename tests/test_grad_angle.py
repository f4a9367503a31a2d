"""log_grad diagnostic: 'deg' in the step's log vars
(ref contract: SD_structure.py:92-134)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.engine import (build_lr_schedule, build_optimizer,
                                   build_train_step, create_train_state)
from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

NORM = dict(type='BN')


def _enc(bb, in_ch):
    return dict(type='EncoderDecoder', backbone=dict(type=bb),
                decode_head=dict(type='SegFormerHead', in_channels=in_ch,
                                 in_index=[0, 1, 2, 3],
                                 feature_strides=[4, 8, 16, 32],
                                 channels=32, dropout_ratio=0.0,
                                 num_classes=5, norm_cfg=NORM,
                                 align_corners=False,
                                 decoder_params=dict(embed_dim=32)))


def test_log_grad_reports_angle():
    model = build_segmentor(dict(
        type='SDModule',
        cfg_s=_enc('mit_b0', [32, 64, 160, 256]),
        cfg_t=_enc('mit_b1', [64, 128, 320, 512]),
        distillation=[{'student_layer': 'decode_head.linear_pred',
                       'teacher_layer': 'decode_head.linear_pred',
                       'loss_name': 'CGDLoss',
                       'loss_config': {'group_size': 5},
                       'log_grad': True}],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    assert model.log_grad
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    lr = build_lr_schedule(dict(policy='poly', power=1.0), 1e-3, 100)
    tx = build_optimizer(dict(type='AdamW', lr=1e-3, weight_decay=0.0),
                         variables['student']['params'], lr)
    state = create_train_state(jax.random.key(1), variables['student'], tx)
    step_fn = build_train_step(model, tx, lr, donate=False)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.randint(0, 5, (1, 32, 32)), jnp.int32)
    _, log_vars = step_fn(state, variables['teacher'], img, gt)
    deg = float(log_vars['deg'])
    assert 0.0 <= deg <= 180.0
