"""Fused LayerNorm kernel (Pallas, TPU) for lane-starved channel widths.

MiT stages 1-2 run LayerNorm over C in {32, 64} (student b0) and {64, 128}
(teacher b3) at N = 16k-65k tokens (ref mix_transformer.py:221-442). XLA
lowers each as a multi-pass chain (fp32 convert -> mean reduce -> center ->
variance reduce -> normalize), every pass tiled (8, 128) with C on the
128-wide lane dimension — 75% of the vector unit idles at C=32, and the
round-2 profile attributes ~4 ms/step of the distillation hot loop to
these small reductions (docs/perf.md).

This kernel does the whole thing in ONE pass per row tile: load (T, C)
bf16, upcast in-register, mean/variance as lane reductions, write (T, C)
output. The backward is also a single pass (stats recomputed in-register —
two lane reductions beat round-tripping (T, 1) stat planes, whose lane-1
layout also sent Mosaic into pathological compiles) producing dx plus
per-tile partial (dscale, dbias) rows that XLA sums.

Numerics: statistics in fp32 (matching flax nn.LayerNorm's
higher-precision stats with ``dtype=bfloat16``), output in the input
dtype. use_fused_layer_norm gates to the TPU backend, C <= 64 and
row counts divisible by a lane tile.

**Negative result (round 3, kept like sra_attn):** standalone the kernel
is correct and fast to compile, but wired into MiT it REGRESSED the
distillation step (202 -> 185 imgs/s at either C<=128 or C<=64 gating,
inference 737 -> 592 fps): every LayerNorm custom call is a fusion
barrier, so XLA loses the LN->(q/kv dense) and residual-add fusions it
otherwise builds, and that costs more than the lane-starved reductions
save. The kernel + module (models/utils/norm.py::FusedLayerNorm) stay
in-tree with interpret-mode tests for future hardware/compiler balances;
the backbones keep nn.LayerNorm.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILES = (256, 128, 64, 32, 16, 8)  # >256 rows/block makes Mosaic
# unroll hundreds of native (8, lane) tiles -> pathological compile times


def _row_tile(rows):
    return next((t for t in _ROW_TILES if rows % t == 0), None)


def use_fused_layer_norm(shape, c):
    """TPU backend, narrow channel dim, tileable row count. C == 128
    already fills the lanes — XLA's fused chain wins there (measured),
    so only genuinely lane-starved widths dispatch here."""
    if c > 64:
        return False
    rows = 1
    for d in shape[:-1]:
        rows *= d
    if rows == 0 or _row_tile(rows) is None:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _fwd_kernel(eps, x_ref, scale_ref, bias_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)                       # (T, C)
    scale = scale_ref[...].astype(jnp.float32)               # (1, C)
    bias = bias_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y_ref[...] = (xc * rstd * scale + bias).astype(y_ref.dtype)


def _bwd_kernel(eps, x_ref, scale_ref, dy_ref,
                dx_ref, dscale_ref, dbias_ref):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    # stats recomputed in-register (two lane reductions) — cheaper than
    # round-tripping (T, 1) stat planes through HBM
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    g = dy * scale
    gm = jnp.mean(g, axis=1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (g - gm - xhat * gxm)).astype(dx_ref.dtype)
    # per-tile partials, kept 8-sublane-aligned — single-sublane (1, C)
    # output blocks send Mosaic into pathological relayouts/compiles
    t, c = dy.shape
    dscale_ref[0] = jnp.sum((dy * xhat).reshape(t // 8, 8, c), axis=0)
    dbias_ref[0] = jnp.sum(dy.reshape(t // 8, 8, c), axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps=1e-6, interpret=False):
    """LayerNorm over the last axis. x (..., C); scale/bias (C,)."""
    y, _ = _fln_fwd(x, scale, bias, eps, interpret)
    return y


def _fln_fwd(x, scale, bias, eps, interpret):
    orig_shape = x.shape
    c = x.shape[-1]
    rows = x.size // c
    t = _row_tile(rows)
    xr = x.reshape(rows, c)
    kernel = functools.partial(_fwd_kernel, float(eps))
    y = pl.pallas_call(
        kernel,
        grid=(rows // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return y.reshape(orig_shape), (x, scale)


def _fln_bwd(eps, interpret, residuals, dy):
    x, scale = residuals
    orig_shape = x.shape
    c = x.shape[-1]
    rows = x.size // c
    t = _row_tile(rows)
    n_tiles = rows // t
    xr = x.reshape(rows, c)
    dyr = dy.reshape(rows, c)
    kernel = functools.partial(_bwd_kernel, float(eps))
    dx, dscale_p, dbias_p = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr, scale.reshape(1, c), dyr)
    dscale = jnp.sum(dscale_p, axis=(0, 1)).astype(scale.dtype)
    dbias = jnp.sum(dbias_p, axis=(0, 1)).astype(scale.dtype)
    return dx.reshape(orig_shape), dscale, dbias


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
