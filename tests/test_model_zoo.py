"""Shape tests for the extended model zoo
(ref strategy: tests/test_backbone.py / test_heads.py)."""

import jax
import jax.numpy as jnp
import pytest

from segdistill_tpu.models import (build_backbone, build_head,
                                   build_segmentor)

pytestmark = pytest.mark.slow

NORM = dict(type='BN')


def _run_backbone(cfg, shape=(1, 64, 64, 3)):
    bb = build_backbone(cfg)
    x = jnp.zeros(shape)
    variables = bb.init({'params': jax.random.key(0)}, x)
    return bb.apply(variables, x)


def test_unet():
    outs = _run_backbone(dict(type='UNet', base_channels=16, num_stages=4,
                              strides=(1, 1, 1, 1),
                              enc_num_convs=(2, 2, 2, 2),
                              dec_num_convs=(2, 2, 2),
                              downsamples=(True, True, True),
                              enc_dilations=(1, 1, 1, 1),
                              dec_dilations=(1, 1, 1), norm_cfg=NORM))
    assert outs[0].shape == (1, 8, 8, 128)   # bottleneck
    assert outs[-1].shape == (1, 64, 64, 16)  # full resolution


def test_fast_scnn():
    outs = _run_backbone(dict(type='FastSCNN', norm_cfg=NORM))
    assert outs[0].shape == (1, 8, 8, 64)    # higher (1/8)
    assert outs[1].shape == (1, 2, 2, 128)   # lower (1/32)
    assert outs[2].shape == (1, 8, 8, 128)   # fusion (1/8)


def test_cgnet():
    outs = _run_backbone(dict(type='CGNet', norm_cfg=NORM))
    assert outs[0].shape[-1] == 32 + 3
    # stage outputs re-inject the downsampling block (ref cgnet.py:313-334)
    assert outs[1].shape[-1] == 2 * 64 + 3
    assert outs[2].shape[-1] == 2 * 128


def test_mobilenet_v3():
    outs = _run_backbone(dict(type='MobileNetV3', arch='small',
                              out_indices=(0, 1, 12), norm_cfg=NORM))
    assert len(outs) == 3
    assert outs[-1].shape[-1] == 576


def test_hrnet_w18_small():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(2,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(2, 2), num_channels=(18, 36)),
        stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                    num_blocks=(2, 2, 2), num_channels=(18, 36, 72)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(2, 2, 2, 2),
                    num_channels=(18, 36, 72, 144)))
    outs = _run_backbone(dict(type='HRNet', extra=extra, norm_cfg=NORM))
    assert [o.shape for o in outs] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144)]


def test_resnest():
    outs = _run_backbone(dict(type='ResNeSt', depth=50, num_stages=4,
                              out_indices=(0, 1, 2, 3), norm_cfg=NORM))
    assert outs[-1].shape == (1, 2, 2, 2048)


@pytest.mark.parametrize('head_cfg,feat_ch', [
    (dict(type='FPNHead', in_channels=[32, 64, 128, 256],
          in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
          channels=32, num_classes=19, norm_cfg=NORM), None),
    (dict(type='NLHead', in_channels=128, in_index=2, channels=32,
          num_classes=19, norm_cfg=NORM), None),
    (dict(type='GCHead', in_channels=128, in_index=2, channels=32,
          num_classes=19, norm_cfg=NORM), None),
    (dict(type='DNLHead', in_channels=128, in_index=2, channels=32,
          num_classes=19, norm_cfg=NORM), None),
    (dict(type='DepthwiseSeparableFCNHead', in_channels=128, in_index=2,
          channels=32, num_classes=19, norm_cfg=NORM), None),
])
def test_heads_shapes(head_cfg, feat_ch):
    head = build_head(head_cfg)
    feats = [jnp.zeros((1, 16, 16, 32)), jnp.zeros((1, 8, 8, 64)),
             jnp.zeros((1, 4, 4, 128)), jnp.zeros((1, 2, 2, 256))]
    variables = head.init({'params': jax.random.key(0)}, feats)
    out = head.apply(variables, feats)
    assert out.shape[0] == 1 and out.shape[-1] == 19


def test_lraspp_head():
    head = build_head(dict(type='LRASPPHead', in_channels=[16, 576],
                           in_index=[0, 2], channels=128,
                           branch_channels=(32,), num_classes=19,
                           norm_cfg=NORM))
    feats = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 8, 8, 48)),
             jnp.zeros((1, 4, 4, 576))]
    variables = head.init({'params': jax.random.key(0)}, feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 32, 32, 19)


def test_cascade_encoder_decoder_ocr():
    cfg = dict(
        type='CascadeEncoderDecoder',
        num_stages=2,
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=NORM,
                      contract_dilation=True),
        decode_head=[
            dict(type='FCNHead', in_channels=256, in_index=2, channels=32,
                 num_convs=1, concat_input=False, num_classes=19,
                 norm_cfg=NORM,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  loss_weight=0.4)),
            dict(type='OCRHead', in_channels=512, in_index=3, channels=64,
                 ocr_channels=32, num_classes=19, norm_cfg=NORM),
        ])
    model = build_segmentor(cfg, train_cfg=dict(),
                            test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _, _ = model.forward_train(
        variables, img, gt, rngs={'dropout': jax.random.key(1)})
    assert 'decode_0.loss_seg' in losses
    assert 'decode_1.loss_seg' in losses
    pred = model.simple_test(variables, img)
    assert pred.shape == (1, 32, 32)
