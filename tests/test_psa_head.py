"""PSAHead: the dense-gather PSAMask formulation vs a naive loop oracle of
the mmcv compiled op's semantics (ref mmseg decode_heads/psa_head.py:18-196
+ mmcv ops.PSAMask), plus head shape/grad smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segdistill_tpu.models import build_head
from segdistill_tpu.models.decode_heads.psa_head import psa_mask

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def naive_collect(y, mask_h, mask_w):
    """out[n, s, t] = y[n, rel(s, t), t] inside the window, else 0
    (mmcv psamask_collect kernel semantics)."""
    n, _, h, w = y.shape
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    out = np.zeros((n, h * w, h * w), y.dtype)
    for i in range(h):
        for j in range(w):
            for yy in range(h):
                for xx in range(w):
                    rh, rw = i - yy + half_h, j - xx + half_w
                    if 0 <= rh < mask_h and 0 <= rw < mask_w:
                        out[:, i * w + j, yy * w + xx] = \
                            y[:, rh * mask_w + rw, yy, xx]
    return out


def naive_distribute(y, mask_h, mask_w):
    """out[n, q, p] = y[n, rel(p, q), q] (mmcv psamask_distribute)."""
    col = naive_collect(y, mask_h, mask_w)
    # distribute(q, p) = collect-gather with roles swapped = transpose
    # of collect computed on the same input
    return np.transpose(col, (0, 2, 1))


@pytest.mark.parametrize('mask', [(3, 3), (5, 3)])
def test_psa_mask_matches_naive(mask):
    mask_h, mask_w = mask
    rs = np.random.RandomState(0)
    y = rs.randn(2, mask_h * mask_w, 4, 5).astype(np.float32)
    got_c = np.asarray(psa_mask(jnp.asarray(y), mask, 'collect'))
    np.testing.assert_allclose(got_c, naive_collect(y, mask_h, mask_w))
    got_d = np.asarray(psa_mask(jnp.asarray(y), mask, 'distribute'))
    np.testing.assert_allclose(got_d, naive_distribute(y, mask_h, mask_w))


@pytest.mark.parametrize('psa_type,compact',
                         [('bi-direction', False), ('collect', False),
                          ('distribute', False), ('collect', True)])
def test_psa_head_shapes(psa_type, compact):
    # compact mode requires mask_h*mask_w == shrunk h*w (16/2 -> 8x8)
    mask_size = (8, 8) if compact else (9, 9)
    head = build_head(dict(
        type='PSAHead', in_channels=32, in_index=0, channels=16,
        mask_size=mask_size, psa_type=psa_type, compact=compact,
        shrink_factor=2, psa_softmax=True, dropout_ratio=0.1,
        num_classes=7, norm_cfg=dict(type='BN'), align_corners=False))
    x = [jnp.zeros((2, 16, 16, 32))]
    variables = head.init({'params': jax.random.key(0)}, x)
    out = head.apply(variables, x)
    assert out.shape == (2, 16, 16, 7)

    def loss(params):
        v = {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}}
        out, _ = head.apply(v, x, train=True,
                            rngs={'dropout': jax.random.key(1)},
                            mutable=['batch_stats', 'feats'])
        return jnp.sum(out ** 2)
    g = jax.grad(loss)(variables['params'])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_psa_head_odd_shrink():
    """h % shrink and w % shrink both nonzero -> align_corners flip path
    (ref :122-129)."""
    head = build_head(dict(
        type='PSAHead', in_channels=16, in_index=0, channels=8,
        mask_size=(5, 5), psa_type='bi-direction', shrink_factor=2,
        dropout_ratio=0, num_classes=5, norm_cfg=dict(type='BN'),
        align_corners=False))
    x = [jnp.zeros((1, 9, 9, 16))]
    variables = head.init({'params': jax.random.key(0)}, x)
    out = head.apply(variables, x)
    assert out.shape == (1, 9, 9, 5)
