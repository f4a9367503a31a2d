"""Naive-oracle test for CCHead's criss-cross attention reformulation.

The reference head (``/root/reference/mmseg/models/decode_heads/
cc_head.py:33-41``) delegates to mmcv's compiled CUDA
``CrissCrossAttention`` op, which has no Python source in the reference
tree. Its documented semantics (CCNet, arXiv:1811.11721; mmcv's op):
every pixel (i, j) attends over its criss-cross set — the full row i
plus the full column j, with the self position counted ONCE (mmcv masks
the column branch's diagonal with -inf) — via a joint softmax over the
H + W scores, and the aggregated value is blended residually with a
zero-initialised scalar: ``out = x + gamma * agg``.

This file checks the repo's masked row+column attention reformulation
(``models/decode_heads/da_head.py::CrissCrossAttention``) against an
independent per-pixel python loop implementing those semantics
directly, with gamma forced nonzero so the attention path actually
contributes. The checkpoint round-trip vs a torch twin lives in
``test_torch_parity.py::TestCCHeadParity``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.models.decode_heads.da_head import CrissCrossAttention

_CCAProbe = CrissCrossAttention  # applied once, standalone


def _naive_criss_cross(x, wq, bq, wk, bk, wv, bv, gamma):
    """Per-pixel loop oracle. x: (H, W, C) fp64. w*: (Cin, Cout)."""
    H, W, C = x.shape
    q = x @ wq + bq
    k = x @ wk + bk
    v = x @ wv + bv
    out = np.zeros_like(x)
    for i in range(H):
        for j in range(W):
            # criss-cross set: full row i, then column j without self
            keys = [k[i, jj] for jj in range(W)]
            vals = [v[i, jj] for jj in range(W)]
            for ii in range(H):
                if ii == i:
                    continue
                keys.append(k[ii, j])
                vals.append(v[ii, j])
            scores = np.array([q[i, j] @ kk for kk in keys])
            scores -= scores.max()
            p = np.exp(scores)
            p /= p.sum()
            agg = sum(pi * vi for pi, vi in zip(p, vals))
            out[i, j] = x[i, j] + gamma * agg
    return out


@pytest.mark.parametrize('hw', [(5, 7), (6, 6)])
def test_cca_matches_naive_oracle(hw):
    H, W = hw
    C = 16
    rng = np.random.RandomState(0)
    x = rng.randn(1, H, W, C).astype(np.float32)

    probe = _CCAProbe()
    variables = probe.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables['params'])
    # gamma is zero-initialised (residual identity at init) — force it
    # nonzero so the attention path is actually exercised
    params['gamma'] = np.array([0.7], np.float32)

    got = probe.apply({'params': params}, jnp.asarray(x))

    inter = C // 8
    wq = params['query_conv']['kernel'].reshape(C, inter)
    bq = params['query_conv']['bias']
    wk = params['key_conv']['kernel'].reshape(C, inter)
    bk = params['key_conv']['bias']
    wv = params['value_conv']['kernel'].reshape(C, C)
    bv = params['value_conv']['bias']
    want = _naive_criss_cross(x[0].astype(np.float64),
                              wq.astype(np.float64), bq.astype(np.float64),
                              wk.astype(np.float64), bk.astype(np.float64),
                              wv.astype(np.float64), bv.astype(np.float64),
                              0.7)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-4,
                               atol=2e-5)


def test_cca_self_counted_once():
    """The self position must appear exactly once in the softmax
    denominator (mmcv masks the column diagonal with -inf). With
    identical q/k everywhere, every score ties, so each attention
    weight must be exactly 1/(H + W - 1) — a double-counted self would
    give 1/(H + W)."""
    H, W, C = 4, 3, 8
    x = np.ones((1, H, W, C), np.float32)

    probe = _CCAProbe()
    variables = probe.init(jax.random.key(1), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables['params'])
    params['gamma'] = np.array([1.0], np.float32)
    # constant input + zeroed q/k conv -> uniform scores; value conv
    # passes the per-position index through one channel
    for name in ('query_conv', 'key_conv'):
        params[name]['kernel'] = np.zeros_like(params[name]['kernel'])
        params[name]['bias'] = np.zeros_like(params[name]['bias'])
    params['value_conv']['kernel'] = np.zeros_like(
        params['value_conv']['kernel'])
    params['value_conv']['bias'] = np.zeros_like(
        params['value_conv']['bias'])
    # value = const 1 on channel 0 -> agg = sum of weights = 1 exactly
    params['value_conv']['bias'][0] = 1.0

    got = np.asarray(probe.apply({'params': params}, jnp.asarray(x)))
    # out = x + gamma * agg; agg channel0 == 1 (weights sum to 1),
    # other channels 0
    np.testing.assert_allclose(got[0, :, :, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(got[0, :, :, 1:], 1.0, atol=1e-6)

    # now make the value encode position along channel 0: v0 = row index
    # via a per-pixel value bias is impossible with a 1x1 conv, so use
    # x itself as the carrier: x channel 0 = row index, value = identity
    # on channel 0
    x2 = np.ones((1, H, W, C), np.float32)
    x2[0, :, :, 0] = np.arange(H, dtype=np.float32)[:, None]
    params['value_conv']['bias'][0] = 0.0
    params['value_conv']['kernel'] = np.zeros_like(
        params['value_conv']['kernel'])
    params['value_conv']['kernel'][0, 0, 0, 0] = 1.0
    got2 = np.asarray(probe.apply({'params': params}, jnp.asarray(x2)))
    # uniform weights over the criss-cross set of pixel (i, j):
    # row contributes W * i, column contributes sum(rows) - i
    n = H + W - 1
    rows = np.arange(H, dtype=np.float64)[:, None] * np.ones((1, W))
    col_sum = float(np.arange(H).sum())
    expect = x2[0, :, :, 0] + (W * rows + col_sum - rows) / n
    np.testing.assert_allclose(got2[0, :, :, 0], expect, rtol=1e-6)
