"""Fused multi-scale upsample-and-sum kernel vs the unfused resize path
(interpret mode). Covers the SegFormer head's hot composition
(ref segformer_head.py:84-95): several integer-stride feature maps
bilinearly upsampled (align_corners=False) to a common grid and summed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.ops.pallas.resize_sum import (
    _resize_sum_ref, can_use_fused_resize_sum, fused_resize_sum)


def _parts(shapes, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(*s) * 2, np.float32).astype(dtype)
                 for s in shapes)


@pytest.mark.parametrize('shapes,out_hw', [
    # the head's 4-stage pyramid (strides 8/16/32 below a stride-4 base)
    ([(2, 8, 8, 128), (2, 4, 4, 128), (2, 2, 2, 128)], (16, 16)),
    ([(1, 8, 8, 128)], (16, 16)),             # single 2x part
    ([(1, 2, 2, 128)], (16, 16)),             # single 8x part
    ([(1, 4, 8, 128)], (16, 16)),             # anisotropic (4x, 2x)
    ([(2, 16, 16, 128), (2, 4, 4, 128)], (32, 32)),  # mixed base grid
])
def test_forward_matches_unfused(shapes, out_hw):
    parts = _parts(shapes)
    got = fused_resize_sum(parts, out_hw, True)
    want = _resize_sum_ref(parts, out_hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fp32_gradients_match_resize_adjoint():
    parts = _parts([(2, 8, 8, 128), (2, 4, 4, 128)])
    f = lambda ps: jnp.sum(fused_resize_sum(ps, (16, 16), True) ** 2)
    fr = lambda ps: jnp.sum(_resize_sum_ref(ps, (16, 16)) ** 2)
    g = jax.grad(f)(parts)
    gr = jax.grad(fr)(parts)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_matches_fp32_to_rounding():
    parts32 = _parts([(2, 8, 8, 128), (2, 4, 4, 128)])
    partsb = tuple(p.astype(jnp.bfloat16) for p in parts32)
    got = fused_resize_sum(partsb, (16, 16), True).astype(jnp.float32)
    want = _resize_sum_ref(parts32, (16, 16))
    # bf16 inputs, fp32 lerp/accumulate: error bounded by input rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.08)
    g = jax.grad(lambda ps: jnp.sum(
        fused_resize_sum(ps, (16, 16), True).astype(jnp.float32) ** 2))(
        partsb)
    gr = jax.grad(lambda ps: jnp.sum(
        _resize_sum_ref(ps, (16, 16)) ** 2))(parts32)
    for a, b in zip(g, gr):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999


def test_eligibility_gate():
    ok = can_use_fused_resize_sum
    # shape gates are backend-independent rejections
    assert not ok([(2, 8, 8, 127)], (16, 16))        # lane-misaligned C
    assert not ok([(2, 8, 8, 128)], (20, 16))        # non-integer ratio
    assert not ok([(2, 16, 16, 128)], (16, 16))      # nothing to upsample
    assert not ok([(2, 8, 8, 128), (2, 3, 3, 128)], (16, 16))  # no base grid
    assert not ok([], (16, 16))
    assert not ok([(2, 8, 8, 128), (1, 4, 4, 128)], (16, 16))  # batch mix
    # below the work threshold (batch-1 inference heads run faster unfused)
    assert not ok([(1, 64, 64, 256)], (128, 128))
    # dtype-aware VMEM estimate: fp32 B3-teacher-head shapes exceed VMEM
    # (reproduced compile-OOM at 129.7M/128M), bf16 fits (subject to
    # backend check)
    b3 = [(8, 64, 64, 768), (8, 32, 32, 768), (8, 16, 16, 768)]
    assert not ok(b3, (128, 128), dtype=jnp.float32)


def test_eval_bn_fold_matches_unfolded_head(monkeypatch):
    """_ComposedFuse's eval-mode BN fold (segformer_head.py): BN with
    running stats is a per-channel affine that commutes with the linear,
    constant-preserving resize-sum, so folding its scale into the composed
    GEMMs + applying the shift post-sum must match BN applied to the
    summed map. Forced onto the fused path (interpret mode) on CPU."""
    import functools

    from segdistill_tpu.models import build_segmentor
    import segdistill_tpu.ops.pallas as pallas_mod

    def _head_model():
        return build_segmentor(dict(
            type='EncoderDecoder',
            backbone=dict(type='mit_b0', drop_path_rate=0.0),
            decode_head=dict(
                type='SegFormerHead', in_channels=[32, 64, 160, 256],
                in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
                channels=32, dropout_ratio=0.0, num_classes=7,
                norm_cfg=dict(type='BN'), align_corners=False,
                decoder_params=dict(embed_dim=128)),
            train_cfg=dict(), test_cfg=dict(mode='whole')))

    model = _head_model()
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    # non-trivial BN stats/params so the fold actually moves values
    rng = np.random.RandomState(3)
    bn = variables['batch_stats']['decode_head']['linear_fuse']['bn']['bn']
    bn['mean'] = jnp.asarray(rng.randn(128), jnp.float32)
    bn['var'] = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bnp = variables['params']['decode_head']['linear_fuse']['bn']['bn']
    bnp['scale'] = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bnp['bias'] = jnp.asarray(rng.randn(128), jnp.float32)

    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    want = model.encode_decode(variables, img)  # unfolded (gate is False)

    monkeypatch.setattr(pallas_mod, 'can_use_fused_resize_sum',
                        lambda *a, **k: True)
    monkeypatch.setattr(
        pallas_mod, 'fused_resize_sum',
        functools.partial(pallas_mod.fused_resize_sum, interpret=True))
    got = model.encode_decode(variables, img)  # folded + fused kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
