"""Fused CE kernel vs the unfused math (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.ops.pallas.seg_ce import fused_seg_ce
from segdistill_tpu.ops import resize_nchw


def _ref(logits, labels, out_hw, num_classes, ignore_index=255):
    z = resize_nchw(logits.astype(jnp.float32), size=out_hw,
                    mode='bilinear', align_corners=False)
    z = jnp.transpose(z, (0, 2, 3, 1))
    valid = (labels != ignore_index) & (labels >= 0) \
        & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(z, axis=-1)
    zy = jnp.take_along_axis(z, safe[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, lse - zy, 0.0)
    correct = jnp.sum(((jnp.argmax(z, -1) == labels) & valid)
                      .astype(jnp.float32))
    return jnp.sum(ce), correct


def _data(b=2, c=7, h=8, r=2, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, c, h, h) * 3, jnp.float32)
    labels = rng.randint(0, c, (b, h * r, h * r)).astype(np.int32)
    labels[0, 0, :3] = 255
    return logits, jnp.asarray(labels), (h * r, h * r)


@pytest.mark.parametrize('ratio', [1, 2, 4])
def test_forward_matches(ratio):
    logits, labels, out_hw = _data(r=ratio)
    got = fused_seg_ce(logits, labels, out_hw, 7, 255, interpret=True)
    ref = _ref(logits, labels, out_hw, 7)
    assert float(got[0]) == pytest.approx(float(ref[0]), rel=1e-5)
    assert float(got[1]) == float(ref[1])


def test_gradient_matches():
    logits, labels, out_hw = _data(b=1, c=5, h=6, r=2, seed=3)

    def f_fused(z):
        return fused_seg_ce(z, labels, out_hw, 5, 255,
                            interpret=True)[0] / labels.size

    def f_ref(z):
        return _ref(z, labels, out_hw, 5)[0] / labels.size

    g1 = jax.grad(f_fused)(logits)
    g2 = jax.grad(f_ref)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-7)


@pytest.mark.parametrize('c', [20, 67])
def test_channel_tile_paths(c):
    """Divisor channel tile (c=20 -> ct=20, no pad — the production
    C=150 -> ct=30 path) and the pad fallback (c=67 prime -> ct=32)."""
    from segdistill_tpu.ops.pallas.seg_ce import _pick_ctile
    assert _pick_ctile(150) == 30 and _pick_ctile(20) == 20 \
        and _pick_ctile(67) == 32
    logits, labels, out_hw = _data(c=c, h=4, r=2, seed=5)

    def f_fused(z):
        return fused_seg_ce(z, labels, out_hw, c, 255,
                            interpret=True)[0] / labels.size

    def f_ref(z):
        return _ref(z, labels, out_hw, c)[0] / labels.size

    assert float(f_fused(logits)) == pytest.approx(float(f_ref(logits)),
                                                   rel=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f_fused)(logits)),
                               np.asarray(jax.grad(f_ref)(logits)),
                               rtol=1e-4, atol=1e-7)


def test_all_ignored():
    logits, labels, out_hw = _data()
    labels = jnp.full_like(labels, 255)
    got = fused_seg_ce(logits, labels, out_hw, 7, 255, interpret=True)
    assert float(got[0]) == 0.0 and float(got[1]) == 0.0
