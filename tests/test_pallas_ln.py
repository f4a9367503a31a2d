"""Fused LayerNorm kernel vs reference math (interpret mode) and the
FusedLayerNorm module's fallback-path equivalence to nn.LayerNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.ops.pallas.layer_norm import (_row_tile,
                                                  fused_layer_norm,
                                                  use_fused_layer_norm)


def _ref_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale
            + bias).astype(x.dtype)


@pytest.mark.parametrize('shape,eps', [
    ((8, 64, 32), 1e-6),
    ((2, 256, 64), 1e-5),
    ((4, 128, 128), 1e-6),
])
def test_fused_ln_matches_reference(shape, eps):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape) * 2 + 1, jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rs.randn(shape[-1]), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(shape[-1]), jnp.float32)
    got = fused_layer_norm(x, scale, bias, eps, interpret=True)
    want = _ref_ln(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_ln_grads_match_reference():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 64, 32), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rs.randn(32), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(32), jnp.float32)
    cot = jnp.asarray(rs.randn(2, 64, 32), jnp.float32)

    def f_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, 1e-6, interpret=True)
                       * cot)

    def f_ref(x, s, b):
        return jnp.sum(_ref_ln(x, s, b, 1e-6) * cot)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gf, gr, ('dx', 'dscale', 'dbias')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-5, err_msg=name)


def test_gating():
    assert _row_tile(8 * 16384) == 256
    assert _row_tile(7) is None
    assert not use_fused_layer_norm((2, 10, 256), 256)  # wide C: XLA path


def test_module_fallback_matches_nn_layernorm():
    """On CPU the module takes the fallback path — must equal
    flax nn.LayerNorm (fp32 stats) to fp32 rounding, preserving the
    torch-parity contract."""
    import flax.linen as nn
    from segdistill_tpu.models.utils import FusedLayerNorm
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 33, 48), jnp.float32)  # odd rows: fallback
    m1 = FusedLayerNorm(epsilon=1e-6)
    m2 = nn.LayerNorm(epsilon=1e-6)
    v1 = m1.init(jax.random.key(0), x)
    v2 = m2.init(jax.random.key(0), x)
    v1 = jax.tree.map(lambda a: a + 0, v1)
    # share random params
    p = {'scale': jnp.asarray(1 + 0.1 * rs.randn(48), jnp.float32),
         'bias': jnp.asarray(0.1 * rs.randn(48), jnp.float32)}
    y1 = m1.apply({'params': p}, x)
    y2 = m2.apply({'params': p}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)
