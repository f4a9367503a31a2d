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


class TestTrainKernel:
    """sra_attention_train (custom VJP): forward + grads vs the fp32
    einsum oracle, interpret mode (hardware validation: bench.py)."""

    def _oracle(self, q, k, v, scale):
        s = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum('bhnm,bhmd->bhnd', p, v)

    @pytest.mark.parametrize('shape', [
        (2, 1, 256, 32),    # stage-4-like (no sr)
        (1, 2, 512, 32),    # multi-head
        (1, 1, 1024, 64),   # two q tiles -> dk/dv accumulation
    ])
    def test_fwd_and_grads_match_oracle(self, shape):
        from segdistill_tpu.ops.pallas import sra_attention_train
        B, H, N, d = shape
        M = 256
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(B, H, N, d), jnp.float32)
        k = jnp.asarray(rs.randn(B, H, M, d), jnp.float32)
        v = jnp.asarray(rs.randn(B, H, M, d), jnp.float32)
        cot = jnp.asarray(rs.randn(B, H, N, d), jnp.float32)
        scale = d ** -0.5

        out = sra_attention_train(q, k, v, scale, True)
        want = self._oracle(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

        def f_kernel(q, k, v):
            return jnp.sum(sra_attention_train(q, k, v, scale, True) * cot)

        def f_oracle(q, k, v):
            return jnp.sum(self._oracle(q, k, v, scale) * cot)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
        go = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, go, ('dq', 'dk', 'dv')):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

    def test_bf16_close_to_fp32_oracle(self):
        from segdistill_tpu.ops.pallas import sra_attention_train
        rs = np.random.RandomState(1)
        q = jnp.asarray(rs.randn(1, 1, 256, 32), jnp.bfloat16)
        k = jnp.asarray(rs.randn(1, 1, 256, 32), jnp.bfloat16)
        v = jnp.asarray(rs.randn(1, 1, 256, 32), jnp.bfloat16)
        out = sra_attention_train(q, k, v, 32 ** -0.5, True)
        want = self._oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), 32 ** -0.5)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(want), rtol=0.03, atol=0.03)


class TestFusedAttentionWiring:
    """Config plumbing of the fused-attention gates (no kernel runs on
    CPU: can_use_fused_attn gates on the TPU backend; these check the
    per-stage fan-out and the SDModule teacher defaults)."""

    def _enc(self, bb, in_ch, **bb_extra):
        return dict(type='EncoderDecoder',
                    backbone=dict(type=bb, style='pytorch', **bb_extra),
                    decode_head=dict(
                        type='SegFormerHead', in_channels=in_ch,
                        in_index=[0, 1, 2, 3],
                        feature_strides=[4, 8, 16, 32], channels=64,
                        dropout_ratio=0.1, num_classes=19,
                        norm_cfg=dict(type='BN'), align_corners=False,
                        decoder_params=dict(embed_dim=64)))

    def test_per_stage_sequence_forwards(self):
        from segdistill_tpu.models import build_backbone
        bb = build_backbone(dict(type='mit_b0',
                                 fused_attention=['train', False, False,
                                                  True]))
        assert bb.fused_attention == ('train', False, False, True)
        v = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        outs = bb.apply(v, jnp.zeros((1, 32, 32, 3)))
        assert len(outs) == 4

    def test_teacher_fused_attention_stays_off_by_default(self):
        """Measured on-chip: fused teacher attention regressed the bench
        step 35.9 -> 38.5 ms (docs/perf.md round-4) — the default must
        stay off; it is an explicit opt-in knob."""
        from segdistill_tpu.models import build_segmentor
        cfg = dict(type='SDModule',
                   cfg_s=self._enc('mit_b0', [32, 64, 160, 256]),
                   cfg_t=self._enc('mit_b1', [64, 128, 320, 512]),
                   distillation=[{'student_layer': 'decode_head.linear_pred',
                                  'teacher_layer': 'decode_head.linear_pred',
                                  'loss_name': 'CGDLoss',
                                  'loss_config': {'group_size': 5}}],
                   train_cfg=dict(), test_cfg=dict(mode='whole'))
        m = build_segmentor(cfg)
        assert m.teacher.backbone.fused_attention is False
        assert m.student.backbone.fused_attention is False

    def test_explicit_config_wins_over_default(self):
        from segdistill_tpu.models import build_segmentor
        cfg = dict(type='SDModule',
                   cfg_s=self._enc('mit_b0', [32, 64, 160, 256]),
                   cfg_t=self._enc('mit_b1', [64, 128, 320, 512],
                                   fused_attention=False),
                   distillation=[{'student_layer': 'decode_head.linear_pred',
                                  'teacher_layer': 'decode_head.linear_pred',
                                  'loss_name': 'CGDLoss',
                                  'loss_config': {'group_size': 5}}],
                   train_cfg=dict(), test_cfg=dict(mode='whole'))
        m = build_segmentor(cfg)
        assert m.teacher.backbone.fused_attention is False
