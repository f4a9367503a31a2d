"""Fused SRA attention (Pallas, TPU) — teacher forward path.

MiT spatial-reduction attention (ref mix_transformer.py:63-133) always
reduces K/V to M = (H/sr)*(W/sr) = 256 tokens at 512^2 inputs, so the
whole K/V block fits VMEM and each q-tile's (T, M) score plane lives in
registers: q @ k^T -> fp32 softmax -> @ v in ONE kernel. The unfused path
materializes the (B, heads, N, M) fp32 attention tensor in HBM (134 MB
per stage-1 block at batch 8) plus a softmax pass and a bf16 cast.

Forward-only (no custom VJP): used for the FROZEN teacher, whose features
sit under stop_gradient — the student keeps the unfused differentiable
path. Numerics match the unfused fp32-softmax island: scores and softmax
statistics are fp32 in-register; output returns to the input dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QTILE = 512


def _kernel(scale, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                              # (T, d) native dtype
    k = k_ref[0]                              # (M, d)
    v = v_ref[0]                              # (M, d)
    # bf16 operands with fp32 MXU accumulation — identical numerics to
    # the unfused einsum(preferred_element_type=f32); upcasting operands
    # to f32 before the dot would fall off the fast MXU path
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def can_use_fused_attn(q_shape, kv_len, head_dim):
    if head_dim > 128 or kv_len > 2048:
        return False
    n = q_shape[2]
    if n % 128:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def fused_sra_attention(q, k, v, scale, interpret=False, qtile=None):
    """q (B, h, N, d); k, v (B, h, M, d) -> (B, h, N, d).

    == softmax(q @ k^T * scale) @ v with fp32 softmax, never
    materializing the (N, M) scores in HBM.
    """
    B, H, N, d = q.shape
    M = k.shape[2]
    if qtile is not None:
        t = qtile
    else:
        # largest lane-aligned tile that DIVIDES N — a non-divisor tile
        # would floor the grid and leave the last N mod t rows unwritten
        t = next((c for c in (512, 384, 256, 128) if N % c == 0), N)
    if N % t:
        raise ValueError(f'q tile {t} does not divide N={N}')
    q_r = q.reshape(B * H, N, d)
    k_r = k.reshape(B * H, M, d)
    v_r = v.reshape(B * H, M, d)
    kernel = functools.partial(_kernel, float(scale))
    out = pl.pallas_call(
        kernel,
        grid=(B * H, N // t),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q_r, k_r, v_r)
    return out.reshape(B, H, N, d)
