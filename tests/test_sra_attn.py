"""Fused SRA attention kernel vs the unfused einsum reference
(interpret mode; the real-chip path is exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segdistill_tpu.ops.pallas import fused_sra_attention


def _reference(q, k, v, scale):
    attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum('bhnm,bhmd->bhnd', attn, v)


@pytest.mark.parametrize('dtype,heads,n,m,d,tol', [
    (jnp.float32, 1, 256, 128, 32, 1e-5),
    (jnp.float32, 2, 512, 256, 64, 1e-5),
    (jnp.bfloat16, 5, 256, 256, 64, 2e-2),
])
def test_fused_sra_attention_matches_reference(dtype, heads, n, m, d, tol):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, heads, n, d), dtype)
    k = jnp.asarray(rs.randn(2, heads, m, d), dtype)
    v = jnp.asarray(rs.randn(2, heads, m, d), dtype)
    scale = d ** -0.5
    got = fused_sra_attention(q, k, v, scale, interpret=True, qtile=128)
    want = _reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_fused_sra_attention_nonmultiple_of_512():
    """N % 128 == 0 but N % 512 != 0 (e.g. whole-mode inference on a
    non-square map): the auto-picked q tile must DIVIDE N, otherwise the
    floored grid leaves the last N mod t rows unwritten (advisor r2)."""
    rs = np.random.RandomState(1)
    n, m, d = 640, 128, 32  # 640 = 128*5: not divisible by 512/384/256
    q = jnp.asarray(rs.randn(1, 2, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(1, 2, m, d), jnp.float32)
    v = jnp.asarray(rs.randn(1, 2, m, d), jnp.float32)
    got = fused_sra_attention(q, k, v, d ** -0.5, interpret=True)
    want = _reference(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # a tail-dropping tile is rejected loudly rather than floored
    with pytest.raises(ValueError):
        fused_sra_attention(q, k, v, d ** -0.5, interpret=True, qtile=512)
