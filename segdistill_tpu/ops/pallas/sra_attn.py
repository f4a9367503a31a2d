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


def _pick_tile(N, tmax=512):
    # largest lane-aligned tile that DIVIDES N — a non-divisor tile
    # would floor the grid and leave the last N mod t rows unwritten
    cands = [c for c in (4096, 2048, 1024, 512, 384, 256, 128)
             if c <= tmax]
    return next((c for c in cands if N % c == 0), N)


def fused_sra_attention(q, k, v, scale, interpret=False, qtile=None):
    """q (B, h, N, d); k, v (B, h, M, d) -> (B, h, N, d).

    == softmax(q @ k^T * scale) @ v with fp32 softmax, never
    materializing the (N, M) scores in HBM.
    """
    B, H, N, d = q.shape
    M = k.shape[2]
    t = qtile if qtile is not None else _pick_tile(N)
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


# ---------------------------------------------------------------------------
# Training (differentiable) flash attention
# ---------------------------------------------------------------------------
#
# Because M is always <= 2048 (256 at 512^2 inputs), the backward needs no
# online-softmax machinery: each q-tile's full (t, M) probability plane is
# recomputed in-register from q, k and the forward's saved per-row
# log-sum-exp, and dk/dv accumulate across the sequential q-tile grid steps
# into a revisited fp32 output block. The unfused student path materializes
# the fp32 score tensor plus ~10 softmax/bwd streams over it (measured
# ~2.6 ms/step of row-stat fusions alone at stage 1, docs/perf.md round-3
# roofline); here scores never touch HBM in either pass.


def _bwd_train_kernel(scale, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    # recompute the probability plane in-register (M fits VMEM, and a
    # saved per-row lse would be a single-sublane (1, t) output block —
    # a pathological Mosaic layout; the recompute is one MXU dot + a
    # row max/sum, cheaper than the relayout)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)     # normalized probs, f32
    pb = p.astype(v.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    # dv += p^T @ do  (contract over the q rows of this tile)
    dv_ref[0] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dp = do @ v^T ; softmax vjp: ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    ds = ds * scale
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    # dk += ds^T @ q
    dk_ref[0] += jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sra_attention_train(q, k, v, scale, interpret=False):
    """Differentiable fused SRA attention: q (B, h, N, d), k/v
    (B, h, M, d) -> (B, h, N, d), custom VJP, scores never in HBM."""
    out, _ = _train_fwd(q, k, v, scale, interpret)
    return out


def _train_fwd(q, k, v, scale, interpret):
    # q-tile capped at 512: t=2048 at the stage-1 shape (N=16384) sent
    # Mosaic into a ~5-minute compile; 512 compiles in ~80 s with the
    # same measured step time (docs/perf.md "flash SRA" notes)
    out = fused_sra_attention(q, k, v, scale, interpret=interpret,
                              qtile=_pick_tile(q.shape[2], 512))
    return out, (q, k, v)


def _train_bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    B, H, N, d = q.shape
    M = k.shape[2]
    t = _pick_tile(N, 512)  # see _train_fwd: Mosaic compile-time cap
    q_r = q.reshape(B * H, N, d)
    k_r = k.reshape(B * H, M, d)
    v_r = v.reshape(B * H, M, d)
    g_r = g.reshape(B * H, N, d)
    kernel = functools.partial(_bwd_train_kernel, float(scale))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B * H, N // t),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # dk/dv blocks are indexed by (i,) only: the same fp32 block
            # is revisited across the sequential j grid steps and
            # accumulates every q-tile's contribution
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, M, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, M, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q_r, k_r, v_r, g_r)
    return (dq.reshape(B, H, N, d),
            dk.reshape(B, H, M, d).astype(k.dtype),
            dv.reshape(B, H, M, d).astype(v.dtype))


sra_attention_train.defvjp(_train_fwd, _train_bwd)
