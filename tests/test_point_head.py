"""PointHead (PointRend): point_sample vs torch grid_sample oracle,
static-k sampling invariants, cascade train/test paths
(ref mmseg decode_heads/point_head.py:12-349)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segdistill_tpu.models import build_head, build_segmentor
from segdistill_tpu.models.decode_heads.point_head import (
    calculate_uncertainty, point_sample)

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def test_point_sample_matches_torch_grid_sample():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    rs = np.random.RandomState(0)
    feat = rs.randn(2, 5, 7, 3).astype(np.float32)  # NHWC
    pts = rs.rand(2, 11, 2).astype(np.float32)

    got = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts)))
    # mmcv point_sample == grid_sample(2p-1, align_corners=False), NCHW
    t_feat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    grid = torch.from_numpy(pts * 2 - 1).unsqueeze(2)  # (B, P, 1, 2)
    want = F.grid_sample(t_feat, grid, align_corners=False)[..., 0]
    want = want.permute(0, 2, 1).numpy()  # (B, P, C)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got_n = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts),
                                    mode='nearest'))
    want_n = F.grid_sample(t_feat, grid, mode='nearest',
                           align_corners=False)[..., 0]
    want_n = want_n.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got_n, want_n, rtol=1e-5, atol=1e-6)


def test_uncertainty_is_negative_margin():
    logits = jnp.asarray([[1.0, 3.0, 2.0], [0.0, 0.0, 5.0]])
    u = np.asarray(calculate_uncertainty(logits))
    np.testing.assert_allclose(u, [-1.0, -5.0])


def _head(**kw):
    cfg = dict(type='PointHead', in_channels=[16], in_index=[0],
               channels=8, num_fcs=2, dropout_ratio=-1, num_classes=6,
               align_corners=False, num_points=32, oversample_ratio=2,
               importance_sample_ratio=0.75, subdivision_steps=2,
               subdivision_num_points=24, scale_factor=2)
    cfg.update(kw)
    return build_head(cfg)


def test_point_head_train_and_losses():
    head = _head()
    x = [jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                     jnp.float32)]
    prev = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 6),
                       jnp.float32)
    variables = head.init({'params': jax.random.key(0),
                           'dropout': jax.random.key(1)}, x, prev,
                          train=True)
    (logits, points), _ = head.apply(
        variables, x, prev, train=True, rngs={'dropout': jax.random.key(2)},
        mutable=['feats'])
    assert logits.shape == (2, 32, 6)
    assert points.shape == (2, 32, 2)
    assert np.all((np.asarray(points) >= 0) & (np.asarray(points) <= 1))

    gt = jnp.asarray(np.random.RandomState(2).randint(0, 6, (2, 8, 8)))
    losses = head.losses((logits, points), gt)
    assert np.isfinite(float(losses['loss_point']))
    assert 0 <= float(losses['acc_point']) <= 100

    def f(params):
        (lg, pt), _ = head.apply({'params': params}, x, prev, train=True,
                                 rngs={'dropout': jax.random.key(2)},
                                 mutable=['feats'])
        return jnp.mean(head.losses((lg, pt), gt)['loss_point'])
    g = jax.grad(f)(variables['params'])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_point_head_test_refinement():
    head = _head()
    x = [jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16),
                     jnp.float32)]
    prev = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 6),
                       jnp.float32)
    variables = head.init({'params': jax.random.key(0),
                           'dropout': jax.random.key(1)}, x, prev,
                          train=True)
    out = head.apply(variables, x, prev, train=False)
    # 2 subdivision steps x scale 2 -> 4x resolution
    assert out.shape == (1, 32, 32, 6)
    # un-refined positions must still carry upsampled coarse logits
    assert np.isfinite(np.asarray(out)).all()


def test_pointrend_cascade_end_to_end():
    from segdistill_tpu.zoo import pointrend_r50
    cfg = pointrend_r50(num_classes=5)
    cfg['backbone']['depth'] = 50
    # shrink for CPU: tiny channels
    cfg['neck']['out_channels'] = 16
    cfg['decode_head'][0].update(channels=8,
                                 in_channels=[16, 16, 16, 16])
    cfg['decode_head'][1].update(channels=8, in_channels=[16],
                                 num_points=16, oversample_ratio=2,
                                 subdivision_num_points=16,
                                 subdivision_steps=1)
    model = build_segmentor(cfg)
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    losses, _, _ = model.forward_train(
        variables, img, gt, rngs={'dropout': jax.random.key(1)})
    assert 'decode_0.loss_seg' in losses
    assert 'decode_1.loss_point' in losses
    out = model.encode_decode(variables, img)
    assert out.shape == (1, 32, 32, 5)
