"""Tap-sum depthwise conv (ops/dwconv.py) vs lax.conv oracle.

The tap-sum form replaces XLA's pathological grouped-conv lowering
(6-600x slower on TPU, docs/perf.md) — these tests pin the semantics to
``lax.conv_general_dilated(feature_group_count=C)`` with explicit
symmetric padding, over the kernel/stride/dilation grid the model zoo
actually uses (MiT 3x3 s1, MobileNet 3x3 s2 + 5x5, dilated MNv2 d2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from segdistill_tpu.ops.dwconv import DepthwiseConv2d, depthwise_conv


def _oracle(x, w, b, stride, padding, dilation):
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (sh, sw),
        [(ph, ph), (pw, pw)], rhs_dilation=(dh, dw),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1])
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize('k,stride,padding,dilation', [
    (3, 1, 1, 1),    # MiT Mix-FFN
    (3, 2, 1, 1),    # MobileNet downsample
    (5, 1, 2, 1),    # MobileNetV3 5x5
    (5, 2, 2, 1),
    (3, 1, 2, 2),    # dilated MNv2 (output-stride-8 recipe)
])
def test_matches_lax_conv(k, stride, padding, dilation):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 20, 24), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, 24), jnp.float32)
    b = jnp.asarray(rs.randn(24), jnp.float32)
    got = depthwise_conv(x, w, b, stride, padding, dilation)
    want = _oracle(x, w, b, stride, padding, dilation)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_lax_conv():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 12, 12, 16), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 1, 16), jnp.float32)
    b = jnp.asarray(rs.randn(16), jnp.float32)
    cot = jnp.asarray(rs.randn(2, 6, 6, 16), jnp.float32)

    def f_tap(x, w, b):
        return jnp.sum(depthwise_conv(x, w, b, 2, 1, 1) * cot)

    def f_ora(x, w, b):
        return jnp.sum(_oracle(x, w, b, 2, 1, 1) * cot)

    gt = jax.grad(f_tap, argnums=(0, 1, 2))(x, w, b)
    go = jax.grad(f_ora, argnums=(0, 1, 2))(x, w, b)
    for a, b_, name in zip(gt, go, ('dx', 'dw', 'db')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_bf16_accumulates_fp32():
    rs = np.random.RandomState(2)
    x32 = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.float32)
    w32 = jnp.asarray(rs.randn(3, 3, 1, 8), jnp.float32)
    y16 = depthwise_conv(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
                         None)
    y32 = depthwise_conv(x32, w32, None)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=0.02, atol=0.02)


def test_module_param_layout_matches_nn_conv():
    """Checkpoint/converter contract: identical param tree to
    nn.Conv(feature_group_count=C)."""
    import flax.linen as nn
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 12), jnp.float32)
    m_ref = nn.Conv(12, (3, 3), padding=1, feature_group_count=12,
                    use_bias=True)
    m_tap = DepthwiseConv2d(12, (3, 3), (1, 1), (1, 1))
    v_ref = m_ref.init(jax.random.key(0), x)
    v_tap = m_tap.init(jax.random.key(0), x)
    ref_shapes = jax.tree.map(jnp.shape, v_ref)
    tap_shapes = jax.tree.map(jnp.shape, v_tap)
    assert ref_shapes == tap_shapes
    # and with shared params, identical function
    y_ref = m_ref.apply(v_ref, x)
    y_tap = m_tap.apply(v_ref, x)
    np.testing.assert_allclose(np.asarray(y_tap), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # and the conv-backend path (use_tap=False) is the same function
    m_conv = DepthwiseConv2d(12, (3, 3), (1, 1), (1, 1), use_tap=False)
    y_conv = m_conv.apply(v_ref, x)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_sd_module_teacher_gets_conv_backend():
    """SDModule defaults a MiT teacher's Mix-FFN depthwise to the 'conv'
    backend (train-step overlap win) without touching the student, and an
    explicit config value wins."""
    from segdistill_tpu.models.segmentors.sd_module import \
        _teacher_perf_defaults
    cfg = dict(backbone=dict(type='mit_b3', style='pytorch'))
    out = _teacher_perf_defaults(cfg)
    assert out['backbone']['dwconv_backend'] == 'conv'
    assert 'dwconv_backend' not in cfg['backbone']  # input untouched
    explicit = dict(backbone=dict(type='mit_b3', dwconv_backend='tap'))
    assert _teacher_perf_defaults(explicit)['backbone'][
        'dwconv_backend'] == 'tap'
    resnet = dict(backbone=dict(type='ResNetV1c'))
    assert 'dwconv_backend' not in _teacher_perf_defaults(
        resnet)['backbone']
