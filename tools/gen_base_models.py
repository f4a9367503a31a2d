"""Generate the declarative ``configs/_base_/models/`` fragment corpus.

Each emitted file mirrors the model dict of the same-named reference
fragment (``local_configs/_base_/models/*.py``) so user configs that
inherit a reference model fragment drop in unchanged. Differences from
the reference files, by design:

  * ``pretrained='open-mmlab://…'`` URIs are omitted — there is no mmlab
    weight zoo here; convert reference ``.pth`` checkpoints with
    ``tools/convert_checkpoint.py`` and pass the result instead.
  * ``segformer.py``: the reference names a backbone type ``IMTRv21_5``
    that does not exist anywhere in the reference source either (every
    concrete config overrides ``backbone.type`` to ``mit_bX``); we default
    to ``mit_b5`` (the B5-width channel list the fragment's decode head
    expects) so the bare fragment actually builds.

Run:  python tools/gen_base_models.py [--check]
``--check`` exits nonzero if any checked-in file differs from the
generator output (used by tests/test_config_corpus.py).
"""

import argparse
import os
import pprint
import sys

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs', '_base_', 'models')

SYNC_BN = dict(type='SyncBN', requires_grad=True)


def ce(weight=1.0, use_sigmoid=False):
    return dict(type='CrossEntropyLoss', use_sigmoid=use_sigmoid,
                loss_weight=weight)


def r50_d8_backbone(dilated=True):
    """ResNet50-V1c backbone; d8 (dilated stages) or d32 (plain strides)."""
    return dict(
        type='ResNetV1c', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        dilations=(1, 1, 2, 4) if dilated else (1, 1, 1, 1),
        strides=(1, 2, 1, 1) if dilated else (1, 2, 2, 2),
        norm_cfg=SYNC_BN, norm_eval=False, style='pytorch',
        contract_dilation=True)


def aux_fcn(in_channels=1024, in_index=2, channels=256, num_classes=19,
            norm_cfg=SYNC_BN):
    return dict(
        type='FCNHead', in_channels=in_channels, in_index=in_index,
        channels=channels, num_convs=1, concat_input=False,
        dropout_ratio=0.1, num_classes=num_classes, norm_cfg=norm_cfg,
        align_corners=False, loss_decode=ce(0.4))


def head(type_, num_classes=19, norm_cfg=SYNC_BN, **kw):
    d = dict(type=type_, dropout_ratio=0.1, num_classes=num_classes,
             norm_cfg=norm_cfg, align_corners=False, loss_decode=ce())
    d.update(kw)
    return d


def r50_d8_model(decode_head, dilated=True, aux=True):
    m = dict(type='EncoderDecoder', backbone=r50_d8_backbone(dilated),
             decode_head=decode_head,
             train_cfg=dict(), test_cfg=dict(mode='whole'))
    if aux:
        m['auxiliary_head'] = aux_fcn()
    return m


def unet_backbone():
    return dict(
        type='UNet', in_channels=3, base_channels=64, num_stages=5,
        strides=(1, 1, 1, 1, 1), enc_num_convs=(2, 2, 2, 2, 2),
        dec_num_convs=(2, 2, 2, 2), downsamples=(True, True, True, True),
        enc_dilations=(1, 1, 1, 1, 1), dec_dilations=(1, 1, 1, 1),
        with_cp=False, conv_cfg=None, norm_cfg=SYNC_BN,
        act_cfg=dict(type='ReLU'), upsample_cfg=dict(type='InterpConv'),
        norm_eval=False)


def unet_model(decode_head):
    return dict(
        type='EncoderDecoder', backbone=unet_backbone(),
        decode_head=decode_head,
        auxiliary_head=aux_fcn(in_channels=128, in_index=3, channels=64,
                               num_classes=2),
        train_cfg=dict(),
        test_cfg=dict(mode='slide', crop_size=256, stride=170))


def hrnet_w18_backbone():
    return dict(
        type='HRNet', norm_cfg=SYNC_BN, norm_eval=False,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                        num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                        num_blocks=(4, 4), num_channels=(18, 36)),
            stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                        num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
            stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                        num_blocks=(4, 4, 4, 4),
                        num_channels=(18, 36, 72, 144))))


def hr18_fcn_head(weight=1.0):
    return dict(
        type='FCNHead', in_channels=[18, 36, 72, 144], in_index=(0, 1, 2, 3),
        channels=270, input_transform='resize_concat', kernel_size=1,
        num_convs=1, concat_input=False, dropout_ratio=-1, num_classes=19,
        norm_cfg=SYNC_BN, align_corners=False, loss_decode=ce(weight))


def fpn_neck():
    return dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                out_channels=256, num_outs=4)


def fpn_head(dropout=0.1):
    return dict(
        type='FPNHead', in_channels=[256, 256, 256, 256],
        in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32], channels=128,
        dropout_ratio=dropout, num_classes=19, norm_cfg=SYNC_BN,
        align_corners=False, loss_decode=ce())


def fragments():
    """filename -> model dict (ref: local_configs/_base_/models/<same name>)."""
    f = {}

    f['ann_r50-d8.py'] = r50_d8_model(head(
        'ANNHead', in_channels=[1024, 2048], in_index=[2, 3], channels=512,
        project_channels=256, query_scales=(1,),
        key_pool_scales=(1, 3, 6, 8)))

    f['apcnet_r50-d8.py'] = r50_d8_model(head(
        'APCHead', in_channels=2048, in_index=3, channels=512,
        pool_scales=(1, 2, 3, 6)))

    f['ccnet_r50-d8.py'] = r50_d8_model(head(
        'CCHead', in_channels=2048, in_index=3, channels=512, recurrence=2))

    cg_norm = dict(type='SyncBN', eps=1e-03, requires_grad=True)
    f['cgnet.py'] = dict(
        type='EncoderDecoder',
        backbone=dict(type='CGNet', norm_cfg=cg_norm, in_channels=3,
                      num_channels=(32, 64, 128), num_blocks=(3, 21),
                      dilations=(2, 4), reductions=(8, 16)),
        decode_head=dict(
            type='FCNHead', in_channels=256, in_index=2, channels=256,
            num_convs=0, concat_input=False, dropout_ratio=0,
            num_classes=19, norm_cfg=cg_norm,
            loss_decode=dict(
                type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0,
                class_weight=[
                    2.5959933, 6.7415504, 3.5354059, 9.8663225, 9.690899,
                    9.369352, 10.289121, 9.953208, 4.3097677, 9.490387,
                    7.674431, 9.396905, 10.347791, 6.3927646, 10.226669,
                    10.241062, 10.280587, 10.396974, 10.055647])),
        train_cfg=dict(sampler=None), test_cfg=dict(mode='whole'))

    f['danet_r50-d8.py'] = r50_d8_model(head(
        'DAHead', in_channels=2048, in_index=3, channels=512,
        pam_channels=64))

    f['deeplabv3_r50-d8.py'] = r50_d8_model(head(
        'ASPPHead', in_channels=2048, in_index=3, channels=512,
        dilations=(1, 12, 24, 36)))

    f['deeplabv3_unet_s5-d16.py'] = unet_model(head(
        'ASPPHead', in_channels=64, in_index=4, channels=16,
        dilations=(1, 12, 24, 36), num_classes=2))

    f['deeplabv3plus_r50-d8.py'] = r50_d8_model(head(
        'DepthwiseSeparableASPPHead', in_channels=2048, in_index=3,
        channels=512, dilations=(1, 12, 24, 36), c1_in_channels=256,
        c1_channels=48))

    f['dmnet_r50-d8.py'] = r50_d8_model(head(
        'DMHead', in_channels=2048, in_index=3, channels=512,
        filter_sizes=(1, 3, 5, 7)))

    f['dnl_r50-d8.py'] = r50_d8_model(head(
        'DNLHead', in_channels=2048, in_index=3, channels=512, reduction=2,
        use_scale=True, mode='embedded_gaussian'))

    f['emanet_r50-d8.py'] = r50_d8_model(head(
        'EMAHead', in_channels=2048, in_index=3, channels=256,
        ema_channels=512, num_bases=64, num_stages=3, momentum=0.1))

    f['encnet_r50-d8.py'] = r50_d8_model(head(
        'EncHead', in_channels=[512, 1024, 2048], in_index=(1, 2, 3),
        channels=512, num_codes=32, use_se_loss=True, add_lateral=False,
        loss_se_decode=ce(0.2, use_sigmoid=True)))

    fs_norm = dict(type='SyncBN', requires_grad=True, momentum=0.01)
    f['fast_scnn.py'] = dict(
        type='EncoderDecoder',
        backbone=dict(
            type='FastSCNN', downsample_dw_channels=(32, 48),
            global_in_channels=64, global_block_channels=(64, 96, 128),
            global_block_strides=(2, 2, 1), global_out_channels=128,
            higher_in_channels=64, lower_in_channels=128,
            fusion_out_channels=128, out_indices=(0, 1, 2),
            norm_cfg=fs_norm, align_corners=False),
        decode_head=dict(
            type='DepthwiseSeparableFCNHead', in_channels=128, channels=128,
            concat_input=False, num_classes=19, in_index=-1,
            norm_cfg=fs_norm, align_corners=False,
            loss_decode=ce(0.4, use_sigmoid=True)),
        auxiliary_head=[
            dict(type='FCNHead', in_channels=128, channels=32, num_convs=1,
                 num_classes=19, in_index=-2, norm_cfg=fs_norm,
                 concat_input=False, align_corners=False,
                 loss_decode=ce(0.4, use_sigmoid=True)),
            dict(type='FCNHead', in_channels=64, channels=32, num_convs=1,
                 num_classes=19, in_index=-3, norm_cfg=fs_norm,
                 concat_input=False, align_corners=False,
                 loss_decode=ce(0.4, use_sigmoid=True))],
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['fcn_hr18.py'] = dict(
        type='EncoderDecoder', backbone=hrnet_w18_backbone(),
        decode_head=hr18_fcn_head(),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['fcn_r50-d8.py'] = r50_d8_model(dict(
        type='FCNHead', in_channels=2048, in_index=3, channels=512,
        num_convs=2, concat_input=True, dropout_ratio=0.1, num_classes=19,
        norm_cfg=SYNC_BN, align_corners=False, loss_decode=ce()))

    f['fcn_unet_s5-d16.py'] = unet_model(dict(
        type='FCNHead', in_channels=64, in_index=4, channels=64,
        num_convs=1, concat_input=False, dropout_ratio=0.1, num_classes=2,
        norm_cfg=SYNC_BN, align_corners=False, loss_decode=ce()))

    f['fpn_r50.py'] = dict(
        type='EncoderDecoder', backbone=r50_d8_backbone(dilated=False),
        neck=fpn_neck(), decode_head=fpn_head(),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['gcnet_r50-d8.py'] = r50_d8_model(head(
        'GCHead', in_channels=2048, in_index=3, channels=512, ratio=0.25,
        pooling_type='att', fusion_types=('channel_add',)))

    lr_norm = dict(type='SyncBN', eps=0.001, requires_grad=True)
    f['lraspp_m-v3-d8.py'] = dict(
        type='EncoderDecoder',
        backbone=dict(type='MobileNetV3', arch='large',
                      out_indices=(1, 3, 16), norm_cfg=lr_norm),
        decode_head=dict(
            type='LRASPPHead', in_channels=(16, 24, 960), in_index=(0, 1, 2),
            channels=128, input_transform='multiple_select',
            dropout_ratio=0.1, num_classes=19, norm_cfg=lr_norm,
            act_cfg=dict(type='ReLU'), align_corners=False,
            loss_decode=ce()),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['nonlocal_r50-d8.py'] = r50_d8_model(head(
        'NLHead', in_channels=2048, in_index=3, channels=512, reduction=2,
        use_scale=True, mode='embedded_gaussian'))

    f['ocrnet_hr18.py'] = dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=hrnet_w18_backbone(),
        decode_head=[
            hr18_fcn_head(weight=0.4),
            dict(type='OCRHead', in_channels=[18, 36, 72, 144],
                 in_index=(0, 1, 2, 3), input_transform='resize_concat',
                 channels=512, ocr_channels=256, dropout_ratio=-1,
                 num_classes=19, norm_cfg=SYNC_BN, align_corners=False,
                 loss_decode=ce())],
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['ocrnet_r50-d8.py'] = dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=r50_d8_backbone(),
        decode_head=[
            dict(type='FCNHead', in_channels=1024, in_index=2, channels=256,
                 num_convs=1, concat_input=False, dropout_ratio=0.1,
                 num_classes=19, norm_cfg=SYNC_BN, align_corners=False,
                 loss_decode=ce(0.4)),
            dict(type='OCRHead', in_channels=2048, in_index=3, channels=512,
                 ocr_channels=256, dropout_ratio=0.1, num_classes=19,
                 norm_cfg=SYNC_BN, align_corners=False, loss_decode=ce())],
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['pointrend_r50.py'] = dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=r50_d8_backbone(dilated=False), neck=fpn_neck(),
        decode_head=[
            fpn_head(dropout=-1),
            dict(type='PointHead', in_channels=[256], in_index=[0],
                 channels=256, num_fcs=3, coarse_pred_each_layer=True,
                 dropout_ratio=-1, num_classes=19, align_corners=False,
                 loss_decode=ce())],
        train_cfg=dict(num_points=2048, oversample_ratio=3,
                       importance_sample_ratio=0.75),
        test_cfg=dict(mode='whole', subdivision_steps=2,
                      subdivision_num_points=8196, scale_factor=2))

    f['psanet_r50-d8.py'] = r50_d8_model(head(
        'PSAHead', in_channels=2048, in_index=3, channels=512,
        mask_size=(97, 97), psa_type='bi-direction', compact=False,
        shrink_factor=2, normalization_factor=1.0, psa_softmax=True))

    f['pspnet_r50-d8.py'] = r50_d8_model(head(
        'PSPHead', in_channels=2048, in_index=3, channels=512,
        pool_scales=(1, 2, 3, 6)))

    f['pspnet_unet_s5-d16.py'] = unet_model(head(
        'PSPHead', in_channels=64, in_index=4, channels=16,
        pool_scales=(1, 2, 3, 6), num_classes=2))

    f['segformer.py'] = dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b5', style='pytorch'),
        decode_head=dict(
            type='SegFormerHead', in_channels=[64, 128, 320, 512],
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=128, dropout_ratio=0.1, num_classes=19,
            norm_cfg=SYNC_BN, align_corners=False,
            decoder_params=dict(), loss_decode=ce()),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['upernet_r50.py'] = dict(
        type='EncoderDecoder', backbone=r50_d8_backbone(dilated=False),
        decode_head=head('UPerHead', in_channels=[256, 512, 1024, 2048],
                         in_index=[0, 1, 2, 3], pool_scales=(1, 2, 3, 6),
                         channels=512),
        auxiliary_head=aux_fcn(),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    f['upernet_swin.py'] = dict(
        type='EncoderDecoder',
        backbone=dict(
            type='SwinTransformer', embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], window_size=7, mlp_ratio=4.0,
            qkv_bias=True, qk_scale=None, drop_rate=0.0,
            attn_drop_rate=0.0, drop_path_rate=0.3, ape=False,
            patch_norm=True, out_indices=(0, 1, 2, 3),
            use_checkpoint=False),
        decode_head=head('UPerHead', in_channels=[96, 192, 384, 768],
                         in_index=[0, 1, 2, 3], pool_scales=(1, 2, 3, 6),
                         channels=512),
        auxiliary_head=aux_fcn(in_channels=384),
        train_cfg=dict(), test_cfg=dict(mode='whole'))

    return f


HEADER = ("# Declarative model fragment mirroring the reference's\n"
          "# local_configs/_base_/models/{name} (TPU build; see\n"
          "# tools/gen_base_models.py for the translation notes).\n"
          "# AUTO-GENERATED by tools/gen_base_models.py -- edit there.\n")


def render(name, model):
    body = pprint.pformat(model, width=76, sort_dicts=False)
    return HEADER.format(name=name) + 'model = ' + body + '\n'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true',
                    help='verify checked-in files match generator output')
    args = ap.parse_args()

    os.makedirs(OUT_DIR, exist_ok=True)
    stale = []
    for name, model in sorted(fragments().items()):
        path = os.path.join(OUT_DIR, name)
        text = render(name, model)
        if args.check:
            on_disk = open(path).read() if os.path.exists(path) else None
            if on_disk != text:
                stale.append(name)
        else:
            with open(path, 'w') as fh:
                fh.write(text)
            print('wrote', path)
    if args.check and stale:
        print('stale fragments (rerun tools/gen_base_models.py):', stale)
        sys.exit(1)


if __name__ == '__main__':
    main()
