"""Fused pixel-KL kernel vs the unfused PD math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.ops.pallas.pixel_kl import fused_pixel_kl
from segdistill_tpu.ops import resize_nchw


def _ref(xs, xt, out_hw, tau):
    xs = resize_nchw(xs.astype(jnp.float32), size=out_hw, mode='bilinear',
                     align_corners=False)
    xt = resize_nchw(xt.astype(jnp.float32), size=out_hw, mode='bilinear',
                     align_corners=False)
    b, c = xs.shape[:2]
    xs = xs.transpose(0, 2, 3, 1).reshape(b, -1, c)
    xt = xt.transpose(0, 2, 3, 1).reshape(b, -1, c)
    from jax.scipy.special import xlogy
    log_s = jax.nn.log_softmax(xs / tau, axis=-1)
    p_t = jax.nn.softmax(xt / tau, axis=-1)
    return jnp.sum(xlogy(p_t, p_t) - p_t * log_s)


def _data(b=2, c=7, h=8, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, c, h, h) * 3, jnp.float32),
            jnp.asarray(rng.randn(b, c, h, h) * 3, jnp.float32))


@pytest.mark.parametrize('ratio,tau', [(1, 1.0), (2, 1.0), (4, 2.0)])
def test_forward_matches(ratio, tau):
    xs, xt = _data()
    out_hw = (xs.shape[2] * ratio, xs.shape[3] * ratio)
    got = float(fused_pixel_kl(xs, xt, out_hw, tau, interpret=True))
    ref = float(_ref(xs, xt, out_hw, tau))
    assert got == pytest.approx(ref, rel=1e-5, abs=1e-6)


def test_gradient_matches():
    xs, xt = _data(b=1, c=5, h=6, seed=3)
    out_hw = (12, 12)

    def f_fused(a):
        return fused_pixel_kl(a, xt, out_hw, 1.0, interpret=True)

    def f_ref(a):
        return _ref(a, xt, out_hw, 1.0)

    g1 = jax.grad(f_fused)(xs)
    g2 = jax.grad(f_ref)(xs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-7)


def test_pdloss_routes_and_matches_on_cpu_fallback():
    """On CPU the fused path is ineligible — PDLoss must still produce the
    reference value (regression guard on the routing logic)."""
    from segdistill_tpu.distill import PDLoss
    xs, xt = _data()
    gt = jnp.zeros((2, 16, 16), jnp.int32)
    got = float(PDLoss()(xs, xt, gt, step=1))
    ref = float(_ref(xs, xt, (16, 16), 1.0)) / (2 * 16 * 16)
    assert got == pytest.approx(ref, rel=1e-5)


def test_shared_channel_shuffle_is_invariant_for_pixel_loss():
    """The fused pixel path skips the shared channel shuffle
    (losses.py _try_fused): shuffling both maps with the same permutation
    permutes terms WITHIN each per-pixel softmax distribution, so the
    loss and the (inverse-permuted) gradient are mathematically
    unchanged. Pin the invariance that justifies the skip."""
    xs, xt = _data(b=1, c=6, h=6, seed=4)
    perm = np.random.RandomState(4).permutation(6)
    base = float(_ref(xs, xt, (12, 12), 2.0))
    shuf = float(_ref(xs[:, perm], xt[:, perm], (12, 12), 2.0))
    assert shuf == pytest.approx(base, rel=1e-6)
    g_base = jax.grad(lambda a: _ref(a, xt, (12, 12), 2.0))(xs)
    g_shuf = jax.grad(lambda a: _ref(a[:, perm], xt[:, perm],
                                     (12, 12), 2.0))(xs)
    np.testing.assert_allclose(np.asarray(g_shuf), np.asarray(g_base),
                               rtol=1e-5, atol=1e-7)
