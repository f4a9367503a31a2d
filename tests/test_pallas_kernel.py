"""Fused group-KL Pallas kernel vs the unfused reference math
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.ops.pallas import fused_group_kl, group_kl_reference

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def _data(b=2, c=7, h=8, w=8, seed=0):
    rng = np.random.RandomState(seed)
    xs = rng.randn(b, c, h, w).astype(np.float32) * 3
    xt = rng.randn(b, c, h, w).astype(np.float32) * 3
    return jnp.asarray(xs), jnp.asarray(xt)


@pytest.mark.parametrize('group_size,ratio', [(1, 2), (3, 2), (7, 4),
                                              (4, 1)])
def test_forward_matches_reference(group_size, ratio):
    xs, xt = _data()
    out_hw = (xs.shape[2] * ratio, xs.shape[3] * ratio)
    got = float(fused_group_kl(xs, xt, out_hw, group_size, 2.0,
                               interpret=True))
    ref = float(group_kl_reference(xs, xt, out_hw, group_size, 2.0))
    assert got == pytest.approx(ref, rel=1e-5, abs=1e-7)


def test_forward_group_padding():
    """c=7, g=3 -> one -1e9 pad channel; must contribute nothing."""
    xs, xt = _data(c=7)
    got = float(fused_group_kl(xs, xt, (16, 16), 3, 1.0, interpret=True))
    ref = float(group_kl_reference(xs, xt, (16, 16), 3, 1.0))
    assert np.isfinite(got)
    assert got == pytest.approx(ref, rel=1e-5)


def test_gradient_matches_reference():
    xs, xt = _data(b=1, c=4, h=6, w=6, seed=3)

    def f_fused(a):
        return fused_group_kl(a, xt, (12, 12), 2, 2.0, interpret=True)

    def f_ref(a):
        return group_kl_reference(a, xt, (12, 12), 2, 2.0)

    g_fused = jax.grad(f_fused)(xs)
    g_ref = jax.grad(f_ref)(xs)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_gradient_ratio4_group_pad():
    xs, xt = _data(b=1, c=5, h=4, w=4, seed=7)

    def f_fused(a):
        return 3.0 * fused_group_kl(a, xt, (16, 16), 2, 2.0,
                                    interpret=True)

    def f_ref(a):
        return 3.0 * group_kl_reference(a, xt, (16, 16), 2, 2.0)

    g_fused = jax.grad(f_fused)(xs)
    g_ref = jax.grad(f_ref)(xs)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_identical_inputs_zero_loss_and_grad():
    xs, _ = _data(b=1, c=4)
    loss = float(fused_group_kl(xs, xs, (16, 16), 2, 2.0, interpret=True))
    assert loss == pytest.approx(0.0, abs=1e-6)
    g = jax.grad(lambda a: fused_group_kl(a, xs, (16, 16), 2, 2.0,
                                          interpret=True))(xs)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# shuffled-perm kernel: channel shuffle folded into the block addressing
# ---------------------------------------------------------------------------

def _shuffled_ref(xs, xt, perm, out_hw, group_size, tau):
    """Oracle: gather both maps (the unfused pipeline's x[:, idx]) then run
    the unfused reference math."""
    return group_kl_reference(xs[:, perm], xt[:, perm], out_hw,
                              group_size, tau)


@pytest.mark.parametrize('group_size,ratio,seed', [(1, 2, 0), (3, 2, 1),
                                                   (7, 4, 2), (4, 1, 3)])
def test_shuffled_forward_matches_gather_oracle(group_size, ratio, seed):
    from segdistill_tpu.ops.pallas import fused_group_kl_shuffled
    xs, xt = _data(seed=seed)
    c = xs.shape[1]
    perm = jnp.asarray(np.random.RandomState(seed).permutation(c),
                       jnp.int32)
    out_hw = (xs.shape[2] * ratio, xs.shape[3] * ratio)
    got = float(fused_group_kl_shuffled(xs, xt, perm, out_hw, group_size,
                                        2.0, interpret=True))
    ref = float(_shuffled_ref(xs, xt, perm, out_hw, group_size, 2.0))
    assert got == pytest.approx(ref, rel=1e-5, abs=1e-7)


def test_shuffled_identity_perm_matches_unshuffled():
    from segdistill_tpu.ops.pallas import fused_group_kl_shuffled
    xs, xt = _data(c=6)
    perm = jnp.arange(6, dtype=jnp.int32)
    a = float(fused_group_kl_shuffled(xs, xt, perm, (16, 16), 3, 1.5,
                                      interpret=True))
    b = float(fused_group_kl(xs, xt, (16, 16), 3, 1.5, interpret=True))
    assert a == pytest.approx(b, rel=1e-5)


def test_shuffled_gradient_scatters_to_source_channels():
    """grad flows back through the permutation: d/dxs[fused(perm)] must
    equal d/dxs[oracle(gather-then-kl)] — including the scatter transpose
    of the gather."""
    from segdistill_tpu.ops.pallas import fused_group_kl_shuffled
    xs, xt = _data(b=1, c=6, h=6, w=6, seed=11)
    perm = jnp.asarray([4, 0, 5, 2, 1, 3], jnp.int32)

    g_fused = jax.grad(lambda a: fused_group_kl_shuffled(
        a, xt, perm, (12, 12), 3, 2.0, interpret=True))(xs)
    g_ref = jax.grad(lambda a: _shuffled_ref(
        a, xt, perm, (12, 12), 3, 2.0))(xs)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_shuffled_with_group_padding():
    """c=7, g=3: perm covers the 7 real channels; the -1e9 pad plane joins
    the last group after the shuffle (reference shuffles THEN pads)."""
    from segdistill_tpu.ops.pallas import fused_group_kl_shuffled
    xs, xt = _data(c=7, seed=5)
    perm = jnp.asarray(np.random.RandomState(5).permutation(7), jnp.int32)
    got = float(fused_group_kl_shuffled(xs, xt, perm, (16, 16), 3, 1.0,
                                        interpret=True))
    ref = float(_shuffled_ref(xs, xt, perm, (16, 16), 3, 1.0))
    assert np.isfinite(got)
    assert got == pytest.approx(ref, rel=1e-5)
    g = jax.grad(lambda a: fused_group_kl_shuffled(
        a, xt, perm, (16, 16), 3, 1.0, interpret=True))(xs)
    g_ref = jax.grad(lambda a: _shuffled_ref(
        a, xt, perm, (16, 16), 3, 1.0))(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_shuffled_bf16_inputs():
    from segdistill_tpu.ops.pallas import fused_group_kl_shuffled
    xs, xt = _data(c=6, seed=9)
    perm = jnp.asarray([5, 3, 1, 0, 2, 4], jnp.int32)
    got = float(fused_group_kl_shuffled(
        xs.astype(jnp.bfloat16), xt.astype(jnp.bfloat16), perm, (16, 16),
        3, 2.0, interpret=True))
    ref = float(_shuffled_ref(xs.astype(jnp.bfloat16).astype(jnp.float32),
                              xt.astype(jnp.bfloat16).astype(jnp.float32),
                              perm, (16, 16), 3, 2.0))
    assert got == pytest.approx(ref, rel=1e-4)
