"""Native-dtype attention softmax with fp32-in-register math.

``jax.nn.softmax`` on an fp32 score tensor forces three full-precision
HBM round-trips per attention (the (B, h, N, M) scores write, the
max/exp reduction reads, and an fp32 probability residual saved for the
backward). On TPU the scores tensor is the single largest activation in
the MiT/Swin forward (stage 1: 134 MB fp32 at batch 8), so its dtype is
pure HBM bandwidth (SURVEY §3.1 hot loop; the reference leans on fused
cuDNN softmax kernels instead, e.g. torch softmax in
``mmseg/models/backbones/mix_transformer.py:125``).

``softmax_lastdim`` keeps every HBM-resident tensor in the *input* dtype
(bf16 under mixed precision, fp32 in the parity configs) while computing
the max/exp/normalize — and the backward's ``p * (g - sum(p * g))`` — in
fp32 registers:

* fp32 inputs: bit-identical values and gradients to ``jax.nn.softmax``
  (same stabilized formula, same fp32 arithmetic) — parity tests and the
  fp32 oracle configs are unaffected.
* bf16 inputs: the scores, probabilities, residual, and gradient tensors
  all live in bf16 (half the traffic); only the per-row statistics stay
  fp32. The bf16 rounding of scores/probs is the same order as the bf16
  QK^T matmul rounding the mixed-precision recipe already accepts.
"""

import jax
import jax.numpy as jnp


def _softmax_f32(x):
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=-1, keepdims=True)
    e = jnp.exp(xf - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return p.astype(x.dtype)


@jax.custom_vjp
def softmax_lastdim(x):
    """Softmax over the last axis; fp32 math, input-dtype storage."""
    return _softmax_f32(x)


def _fwd(x):
    p = _softmax_f32(x)
    return p, p


def _bwd(p, g):
    pf = p.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    t = jnp.sum(pf * gf, axis=-1, keepdims=True)
    return ((pf * (gf - t)).astype(p.dtype),)


softmax_lastdim.defvjp(_fwd, _bwd)
