"""Shape/loss tests for the attention-head family
(ref strategy: tests/test_heads.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.models import build_head

pytestmark = pytest.mark.slow

NORM = dict(type='BN')
FEATS = [jnp.zeros((1, 16, 16, 32)), jnp.zeros((1, 8, 8, 64)),
         jnp.zeros((1, 4, 4, 128)), jnp.zeros((1, 2, 2, 256))]


@pytest.mark.parametrize('cfg', [
    dict(type='ANNHead', in_channels=[128, 256], in_index=[2, 3],
         channels=32, project_channels=16, num_classes=19, norm_cfg=NORM),
    dict(type='APCHead', in_channels=256, in_index=3, channels=32,
         pool_scales=(1, 2, 3), num_classes=19, norm_cfg=NORM),
    dict(type='DMHead', in_channels=256, in_index=3, channels=32,
         filter_sizes=(1, 3), num_classes=19, norm_cfg=NORM),
    dict(type='DAHead', in_channels=256, in_index=3, channels=32,
         pam_channels=16, num_classes=19, norm_cfg=NORM),
    dict(type='CCHead', in_channels=256, in_index=3, channels=32,
         num_classes=19, norm_cfg=NORM),
    dict(type='EMAHead', in_channels=256, in_index=3, channels=32,
         ema_channels=32, num_bases=8, num_stages=2, num_classes=19,
         norm_cfg=NORM),
])
def test_attention_heads_forward(cfg):
    head = build_head(cfg)
    variables = head.init({'params': jax.random.key(0)}, FEATS)
    out = head.apply(variables, FEATS)
    # losses path runs (DAHead returns a pam_cam/pam/cam triple and
    # prefixes its loss keys, ref da_head.py:155-178)
    gt = jnp.zeros((1, 8, 8), jnp.int32)
    losses = head.losses(out, gt)
    if isinstance(out, tuple):
        out = out[0]
        loss = losses['pam_cam.loss_seg']
    else:
        loss = losses['loss_seg']
    assert out.shape[0] == 1 and out.shape[-1] == 19
    assert np.isfinite(float(jnp.mean(loss)))


def test_enc_head_se_loss():
    head = build_head(dict(type='EncHead', in_channels=[128, 256],
                           in_index=[2, 3], channels=32, num_codes=8,
                           use_se_loss=True, num_classes=19,
                           norm_cfg=NORM))
    variables = head.init({'params': jax.random.key(0)}, FEATS)
    out = head.apply(variables, FEATS)
    assert isinstance(out, tuple) and out[1].shape == (1, 19)
    losses = head.losses(out, jnp.zeros((1, 8, 8), jnp.int32))
    assert 'loss_se' in losses and 'loss_seg' in losses
