"""Model forward/shape tests (ref strategy: tests/test_models/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.models import (build_backbone, build_head,
                                   build_segmentor)
from segdistill_tpu.models.segmentors import flatten_feats

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

NORM = dict(type='SyncBN', requires_grad=True)


def _init_and_run(module, x, **kw):
    variables = module.init({'params': jax.random.key(0)}, x, **kw)
    return module.apply(variables, x, **kw), variables


def test_mit_b0_shapes():
    bb = build_backbone(dict(type='mit_b0', style='pytorch'))
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_and_run(bb, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 256)]


def test_resnet50_v1c_d8_shapes():
    bb = build_backbone(dict(
        type='ResNetV1c', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1), norm_cfg=NORM,
        norm_eval=False, style='pytorch', contract_dilation=True))
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_and_run(bb, x)
    # d8: stages 3,4 keep stride 8 resolution
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 8, 8, 1024), (1, 8, 8, 2048)]


def test_swin_tiny_shapes():
    bb = build_backbone(dict(type='SwinTransformer', embed_dim=96,
                             depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                             window_size=7, drop_path_rate=0.0))
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_and_run(bb, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 384), (1, 2, 2, 768)]


def test_segformer_head():
    head = build_head(dict(
        type='SegFormerHead', in_channels=[32, 64, 160, 256],
        in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32], channels=128,
        dropout_ratio=0.1, num_classes=150, norm_cfg=NORM,
        align_corners=False, decoder_params=dict(embed_dim=256)))
    feats = [jnp.zeros((1, 16, 16, 32)), jnp.zeros((1, 8, 8, 64)),
             jnp.zeros((1, 4, 4, 160)), jnp.zeros((1, 2, 2, 256))]
    variables = head.init({'params': jax.random.key(0)}, feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 16, 16, 150)


def test_psp_head():
    head = build_head(dict(
        type='PSPHead', in_channels=2048, in_index=3, channels=512,
        pool_scales=(1, 2, 3, 6), dropout_ratio=0.1, num_classes=150,
        norm_cfg=NORM, align_corners=False))
    feats = [jnp.zeros((1, 16, 16, 256)), jnp.zeros((1, 8, 8, 512)),
             jnp.zeros((1, 8, 8, 1024)), jnp.zeros((1, 8, 8, 2048))]
    variables = head.init({'params': jax.random.key(0)}, feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 8, 8, 150)


def test_uper_head():
    head = build_head(dict(
        type='UPerHead', in_channels=[96, 192, 384, 768],
        in_index=[0, 1, 2, 3], pool_scales=(1, 2, 3, 6), channels=64,
        dropout_ratio=0.1, num_classes=150, norm_cfg=NORM,
        align_corners=False))
    feats = [jnp.zeros((1, 16, 16, 96)), jnp.zeros((1, 8, 8, 192)),
             jnp.zeros((1, 4, 4, 384)), jnp.zeros((1, 2, 2, 768))]
    variables = head.init({'params': jax.random.key(0)}, feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 16, 16, 150)


def _mini_encdec(num_classes=19):
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b0', style='pytorch'),
        decode_head=dict(
            type='SegFormerHead', in_channels=[32, 64, 160, 256],
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=128, dropout_ratio=0.1, num_classes=num_classes,
            norm_cfg=NORM, align_corners=False,
            decoder_params=dict(embed_dim=64)))


def test_encoder_decoder_train_and_test():
    model = build_segmentor(_mini_encdec(), train_cfg=dict(),
                            test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((2, 32, 32, 3))
    gt = jnp.zeros((2, 32, 32), jnp.int32)
    losses, feats, new_state = model.forward_train(
        variables, img, gt, rngs={'dropout': jax.random.key(1)},
        capture_feats=True)
    assert 'decode.loss_seg' in losses and 'decode.acc_seg' in losses
    # SegFormerHead keeps reduction='none' (ref segformer_head.py:45-50);
    # parse_losses means the map
    assert float(jnp.mean(losses['decode.loss_seg'])) == pytest.approx(
        np.log(19), rel=0.15)
    assert 'decode_head.linear_pred' in feats
    assert 'backbone.block1.0.attn.Q' in feats
    pred = model.simple_test(variables, img)
    assert pred.shape == (2, 32, 32)


def test_slide_inference_matches_whole_on_small():
    cfg = _mini_encdec()
    model = build_segmentor(cfg, train_cfg=dict(),
                            test_cfg=dict(mode='slide', crop_size=(32, 32),
                                          stride=(32, 32)))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                      jnp.float32)
    # with crop == image, slide must equal whole
    s = model.slide_inference(variables, img)
    w = model.whole_inference(variables, img)
    np.testing.assert_allclose(np.asarray(s), np.asarray(w), atol=1e-5)


def test_aux_head_losses():
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=NORM,
                      contract_dilation=True),
        decode_head=dict(type='PSPHead', in_channels=512, in_index=3,
                         channels=64, pool_scales=(1, 2),
                         dropout_ratio=0.1, num_classes=19, norm_cfg=NORM,
                         align_corners=False),
        auxiliary_head=dict(type='FCNHead', in_channels=256, in_index=2,
                            channels=32, num_convs=1, concat_input=False,
                            dropout_ratio=0.1, num_classes=19,
                            norm_cfg=NORM, align_corners=False,
                            loss_decode=dict(type='CrossEntropyLoss',
                                             use_sigmoid=False,
                                             loss_weight=0.4)))
    model = build_segmentor(cfg, train_cfg=dict(),
                            test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _, _ = model.forward_train(
        variables, img, gt, rngs={'dropout': jax.random.key(1)})
    assert 'decode.loss_seg' in losses
    assert 'aux.loss_seg' in losses
    # aux loss_weight 0.4 applied
    assert float(losses['aux.loss_seg']) == pytest.approx(
        0.4 * np.log(19), rel=0.2)


def test_feature_tap_names_match_reference():
    """Hookable layer names must be the reference's dotted names."""
    bb = build_backbone(dict(type='mit_b0'))
    x = jnp.zeros((1, 32, 32, 3))
    variables = bb.init({'params': jax.random.key(0)}, x)
    _, state = bb.apply(variables, x, mutable=['feats'])
    names = set(flatten_feats(state['feats']))
    for expect in ('block1.0.attn.Q', 'block1.0.attn.ATTN', 'block1.0.FEA',
                   'block4.1.attn.V'):
        assert expect in names, sorted(names)[:10]


def _naive_slide_oracle(model, variables, img, crop, stride):
    """Numpy re-implementation of the reference's overlap-window loop
    (ref encoder_decoder.py:169-212): zero-init accumulators, F.pad-style
    scatter-add of each crop's logits, count-matrix division."""
    h_crop, w_crop = crop
    h_stride, w_stride = stride
    B, h_img, w_img, _ = img.shape
    C = model.num_classes
    preds = np.zeros((B, h_img, w_img, C), np.float64)
    count = np.zeros((1, h_img, w_img, 1), np.float64)
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1, x1 = hi * h_stride, wi * w_stride
            y2, x2 = min(y1 + h_crop, h_img), min(x1 + w_crop, w_img)
            y1, x1 = max(y2 - h_crop, 0), max(x2 - w_crop, 0)
            logit = np.asarray(model.encode_decode(
                variables, jnp.asarray(img[:, y1:y2, x1:x2])), np.float64)
            preds[:, y1:y2, x1:x2] += logit
            count[:, y1:y2, x1:x2] += 1.0
    assert (count == 0).sum() == 0
    return preds / count


@pytest.mark.slow
def test_slide_inference_overlap_matches_naive_oracle():
    """The overlapping-window count-matrix path (the eval mode every PSP
    config declares) vs a naive numpy loop implementing ref
    encoder_decoder.py:169-212. 64x80 input, crop 32, stride 24:
    windows overlap unevenly (counts 1..4) and the last row/col windows
    are re-anchored (y1 = max(y2 - crop, 0))."""
    cfg = _mini_encdec()
    model = build_segmentor(cfg, train_cfg=dict(),
                            test_cfg=dict(mode='slide', crop_size=(32, 32),
                                          stride=(24, 24)))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = np.random.RandomState(3).randn(2, 64, 80, 3).astype(np.float32)
    got = np.asarray(model.slide_inference(variables, jnp.asarray(img)))
    want = _naive_slide_oracle(model, variables, img, (32, 32), (24, 24))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.slow
def test_slide_inference_crop_larger_than_image():
    """Ref contract: 'If h_crop > h_img ... the small patch will be used
    to decode without padding' (encoder_decoder.py:172-174) — a single
    whole-image window, no padding."""
    cfg = _mini_encdec()
    model = build_segmentor(cfg, train_cfg=dict(),
                            test_cfg=dict(mode='slide', crop_size=(64, 64),
                                          stride=(48, 48)))
    variables = model.init_variables(jax.random.key(0), (1, 64, 64, 3))
    # 48 < 64 crop -> single whole-image window; 48px is the smallest
    # mit_b0-valid size here (stage-1 grid 12 >= sr_ratio 8 — torch's
    # sr conv k=8/s=8 cannot run below 32px either, and the jax port
    # raises the same constraint, pinned below)
    img = np.random.RandomState(4).randn(1, 48, 48, 3).astype(np.float32)
    got = np.asarray(model.slide_inference(variables, jnp.asarray(img)))
    want = np.asarray(model.encode_decode(variables, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # degenerate geometry (24px -> stage-1 grid 6 < sr_ratio 8): the
    # reference's Conv2d(k=8, s=8) hard-fails on a 6x6 input too; the
    # port must raise the constraint, not an empty-axis reduce error
    tiny = np.random.RandomState(5).randn(1, 24, 24, 3).astype(np.float32)
    with pytest.raises(ValueError, match='4\\*sr_ratio'):
        model.encode_decode(variables, jnp.asarray(tiny))


def test_matmul_stat_ln_matches_native():
    """MatmulStatLN (MXU-stat LayerNorm, backbone ln_stats='matmul') is a
    drop-in for nn.LayerNorm: identical param tree, same fast-variance
    semantics; outputs agree to one bf16 ulp on the MXU-stat path and
    exactly on the small-shape fallback."""
    import flax.linen as nn
    from segdistill_tpu.models.backbones.mix_transformer import MatmulStatLN

    x_big = jnp.asarray(np.random.RandomState(0).randn(2, 70000, 32),
                        jnp.bfloat16)
    x_small = jnp.asarray(np.random.RandomState(1).randn(2, 100, 32),
                          jnp.bfloat16)
    m = MatmulStatLN(epsilon=1e-6, dtype=jnp.bfloat16)
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), x_small)
    v_ref = ref.init(jax.random.key(0), x_small)
    assert jax.tree.map(lambda a: a.shape, v) == \
        jax.tree.map(lambda a: a.shape, v_ref)

    ya = np.asarray(m.apply(v_ref, x_big), np.float32)  # params swap both ways
    yb = np.asarray(ref.apply(v, x_big), np.float32)
    np.testing.assert_allclose(ya, yb, atol=0.04)  # one bf16 ulp at |y|<=4
    np.testing.assert_array_equal(np.asarray(m.apply(v, x_small)),
                                  np.asarray(ref.apply(v_ref, x_small)))
