"""torch .pth -> flax converter tests: synthetic torch checkpoints with the
reference layouts must land on the right flax leaves with the right
transposes (ref contracts: mmcv_custom/checkpoint.py, tools/mit_converter.py)."""

import numpy as np
import pytest
import torch

import jax

from segdistill_tpu.convert import translate_state_dict
from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def _save_state_dict(tmp_path, sd):
    path = str(tmp_path / 'ckpt.pth')
    torch.save({'state_dict': sd}, path)
    return path


def test_segformer_layout_translation(tmp_path):
    model = build_segmentor(dict(
        type='EncoderDecoder', backbone=dict(type='mit_b0'),
        decode_head=dict(type='SegFormerHead',
                         in_channels=[32, 64, 160, 256],
                         in_index=[0, 1, 2, 3],
                         feature_strides=[4, 8, 16, 32], channels=128,
                         dropout_ratio=0.1, num_classes=7,
                         norm_cfg=dict(type='BN'), align_corners=False,
                         decoder_params=dict(embed_dim=32))),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    rng = np.random.RandomState(0)
    sd = {
        # conv OIHW -> HWIO
        'backbone.patch_embed1.proj.weight': torch.tensor(
            rng.randn(32, 3, 7, 7).astype(np.float32)),
        'backbone.patch_embed1.proj.bias': torch.tensor(
            rng.randn(32).astype(np.float32)),
        # linear (O, I) -> (I, O), module-list rename block1.0 -> block1_0
        'backbone.block1.0.attn.q.weight': torch.tensor(
            rng.randn(32, 32).astype(np.float32)),
        'backbone.block1.0.attn.q.bias': torch.tensor(
            rng.randn(32).astype(np.float32)),
        # LayerNorm weight -> scale
        'backbone.block1.0.norm1.weight': torch.tensor(
            rng.randn(32).astype(np.float32)),
        # SegFormer MLP '.proj' strip
        'decode_head.linear_c4.proj.weight': torch.tensor(
            rng.randn(32, 256).astype(np.float32)),
        # ConvModule bn + running stats
        'decode_head.linear_fuse.bn.weight': torch.tensor(
            rng.randn(32).astype(np.float32)),
        'decode_head.linear_fuse.bn.running_mean': torch.tensor(
            rng.randn(32).astype(np.float32)),
        'decode_head.linear_fuse.bn.num_batches_tracked': torch.tensor(3),
        # classifier conv
        'decode_head.linear_pred.weight': torch.tensor(
            rng.randn(7, 32, 1, 1).astype(np.float32)),
    }
    new_vars, matched, missing, unexpected = translate_state_dict(
        {k: v.numpy() for k, v in sd.items()}, variables)
    assert not unexpected, unexpected

    p = new_vars['params']
    np.testing.assert_allclose(
        np.asarray(p['backbone']['patch_embed1']['proj']['kernel']),
        sd['backbone.patch_embed1.proj.weight'].numpy().transpose(
            2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p['backbone']['block1_0']['attn']['q']['kernel']),
        sd['backbone.block1.0.attn.q.weight'].numpy().T)
    np.testing.assert_allclose(
        np.asarray(p['backbone']['block1_0']['norm1']['scale']),
        sd['backbone.block1.0.norm1.weight'].numpy())
    np.testing.assert_allclose(
        np.asarray(p['decode_head']['linear_c4']['kernel']),
        sd['decode_head.linear_c4.proj.weight'].numpy().T)
    np.testing.assert_allclose(
        np.asarray(p['decode_head']['linear_fuse']['bn']['bn']['scale']),
        sd['decode_head.linear_fuse.bn.weight'].numpy())
    np.testing.assert_allclose(
        np.asarray(new_vars['batch_stats']['decode_head']['linear_fuse']
                   ['bn']['bn']['mean']),
        sd['decode_head.linear_fuse.bn.running_mean'].numpy())
    np.testing.assert_allclose(
        np.asarray(p['decode_head']['linear_pred']['kernel']),
        sd['decode_head.linear_pred.weight'].numpy().transpose(2, 3, 1, 0))


def test_backbone_only_prefixing():
    model = build_segmentor(dict(
        type='EncoderDecoder', backbone=dict(type='mit_b0'),
        decode_head=dict(type='SegFormerHead',
                         in_channels=[32, 64, 160, 256],
                         in_index=[0, 1, 2, 3],
                         feature_strides=[4, 8, 16, 32], channels=32,
                         dropout_ratio=0.0, num_classes=5,
                         norm_cfg=dict(type='BN'), align_corners=False,
                         decoder_params=dict(embed_dim=32))),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    rng = np.random.RandomState(1)
    # official MiT cls checkpoint: no 'backbone.' prefix
    sd = {'patch_embed1.proj.weight':
          rng.randn(32, 3, 7, 7).astype(np.float32)}
    new_vars, matched, _, unexpected = translate_state_dict(
        sd, variables, backbone_only=True)
    assert not unexpected
    np.testing.assert_allclose(
        np.asarray(new_vars['params']['backbone']['patch_embed1']['proj']
                   ['kernel']),
        sd['patch_embed1.proj.weight'].transpose(2, 3, 1, 0))


def test_swin_bias_table_interpolation():
    from segdistill_tpu.convert.torch_loader import _interp_bias_table
    # (2*7-1)^2=169 table -> (2*12-1)^2=529 target
    arr = np.random.RandomState(0).randn(169, 4).astype(np.float32)
    out = _interp_bias_table(arr, (529, 4))
    assert out.shape == (529, 4)
    assert np.isfinite(out).all()


def test_resnet_deep_stem_and_downsample(tmp_path):
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=dict(type='BN'),
                      contract_dilation=True),
        decode_head=dict(type='PSPHead', in_channels=512, in_index=3,
                         channels=32, pool_scales=(1, 2), num_classes=5,
                         norm_cfg=dict(type='BN'), align_corners=False)),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    rng = np.random.RandomState(2)
    sd = {
        'backbone.stem.0.weight': rng.randn(32, 3, 3, 3).astype(np.float32),
        'backbone.stem.1.weight': rng.randn(32).astype(np.float32),
        'backbone.layer2.0.downsample.0.weight':
            rng.randn(128, 64, 1, 1).astype(np.float32),
        'backbone.layer2.0.downsample.1.running_var':
            np.abs(rng.randn(128)).astype(np.float32),
        'decode_head.psp_modules.0.1.conv.weight':
            rng.randn(32, 512, 1, 1).astype(np.float32),
    }
    new_vars, matched, _, unexpected = translate_state_dict(sd, variables)
    assert not unexpected, unexpected
    p = new_vars['params']
    np.testing.assert_allclose(
        np.asarray(p['backbone']['stem_conv1']['kernel']),
        sd['backbone.stem.0.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p['backbone']['layer2_0']['downsample']['conv']
                   ['kernel']),
        sd['backbone.layer2.0.downsample.0.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(new_vars['batch_stats']['backbone']['layer2_0']
                   ['downsample']['bn']['bn']['var']),
        sd['backbone.layer2.0.downsample.1.running_var'])
    np.testing.assert_allclose(
        np.asarray(p['decode_head']['psp_modules']['pool_0']['conv']
                   ['kernel']),
        sd['decode_head.psp_modules.0.1.conv.weight'].transpose(2, 3, 1, 0))


def test_golden_fixture_roundtrip(tmp_path):
    """Converter chain vs the COMMITTED golden fixture (VERDICT r3 #6):
    the deterministic mmseg-layout B0 state dict goes through the
    production converter and the flax model must reproduce the stored
    stage activations and logits (tests/golden/mit_b0_golden.npz,
    generated once by tests/golden_fixture.py's torch twin — this test
    itself needs no torch forward). Guards the layouts of
    ref tools/mit_converter.py:7 + mmcv_custom/checkpoint.py:281-350."""
    import jax.numpy as jnp
    import golden_fixture as gf
    from segdistill_tpu.convert import load_pth_into_variables

    golden = np.load(gf.GOLDEN_PATH)
    sd = gf.golden_state_dict()
    path = str(tmp_path / 'golden_b0.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)

    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='mit_b0', gelu_approximate=False,
                      drop_path_rate=0.0),
        decode_head=dict(
            type='SegFormerHead', in_channels=[32, 64, 160, 256],
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=128, dropout_ratio=0.0, num_classes=gf.NUM_CLASSES,
            norm_cfg=dict(type='BN'), align_corners=False,
            decoder_params=dict(embed_dim=gf.EMBED_DIM)),
        test_cfg=dict(mode='whole')))
    variables = model.init_variables(jax.random.key(0), (1, 64, 64, 3))
    variables = load_pth_into_variables(variables, path, model,
                                        strict=True)

    x = jnp.asarray(golden['input'].transpose(0, 2, 3, 1))
    stages = model.net.apply(variables, x, train=False,
                             method=model.net.extract_feat)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(stages[i], np.float32).transpose(0, 3, 1, 2),
            golden[f'stage{i}'], rtol=5e-4, atol=5e-4,
            err_msg=f'stage{i} diverged from the committed golden fixture')
    logits = model.net.apply(variables, x, train=False, with_aux=False)
    logits = logits['decode'] if isinstance(logits, dict) else logits
    np.testing.assert_allclose(
        np.asarray(logits, np.float32).transpose(0, 3, 1, 2),
        golden['logits'], rtol=5e-4, atol=5e-4,
        err_msg='logits diverged from the committed golden fixture')
