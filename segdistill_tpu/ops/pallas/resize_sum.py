"""Fused multi-scale bilinear-upsample-and-sum kernel (Pallas, TPU).

The SegFormer head's hot pattern — upsample K feature maps of different
strides to a common resolution and add them
(ref ``mmseg/models/decode_heads/segformer_head.py:84-95``; after the
composed-GEMM restructuring the repo sums post-GEMM maps,
``models/decode_heads/segformer_head.py::_ComposedFuse``) — lowers under
XLA to per-stage interpolation matmuls with layout copies between the H
and W passes: measured ~2.6 ms/step of the B3 teacher head's
(8, 128, 128, 768) chain against ~0.6 ms of unavoidable HBM traffic.

This kernel writes the summed upsampled tensor in ONE pass. The
integer-ratio bilinear upsample is decomposed into its r_h x r_w *phase
planes* (same trick as group_kl.py, here producing the interleaved
output instead of reducing it):

    out[R*q + p] = (1-f_p) * S[s*q + d_p] + f_p * S[s*q + d_p + 1]

with a shared base grid (h_b, w_b) = the coarsest source. Each source is
pre-split (one cheap XLA transpose at SOURCE resolution — a few MB, not
the 200 MB output) into its (s_h, s_w) sub-plane grid so every strided
access becomes a static sub-plane index + an edge-clamped roll; the
interleaved output is written as contiguous lane-blocks of the
(B, h_b, R_h, w_b, R_w*C) view, which bitcast-reshapes to NHWC for free.

Forward-only on the hot path design: the backward falls back to the
adjoint of the unfused XLA resize (identical math), so wiring this into
a trainable head is safe — the forward gets the fused kernel, gradients
take the existing path.

Numerics: taps replicate ``ops/resize.py::_linear_taps``
(torch ``F.interpolate(..., align_corners=False)`` semantics, border
clamp via edge replication); lerps and the cross-part accumulation run
in fp32 (slightly *more* accurate than the unfused bf16 XLA path).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .group_kl import _shift


def _grid_taps(r, R):
    """Output-phase taps against an s = R//r strided base grid:
    for phase p in [0, R): src = s*q + d + f with d = floor(c),
    c = (p + 0.5)/r - 0.5."""
    taps = []
    for p in range(R):
        c = (p + 0.5) / r - 0.5
        d = int(np.floor(c))
        taps.append((d, float(c - d)))
    return taps


def _iota_eq(shape, axis, value):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) == value


def _edge(plane, axis, last):
    n = plane.shape[axis]
    return jax.lax.slice_in_dim(plane, n - 1 if last else 0,
                                n if last else 1, axis=axis)


def _subtap(planes, s, d, axis):
    """P[q] = X[s*q + d] along ``axis`` where X is the full-resolution
    source whose stride-s sub-planes are ``planes`` (planes[j][q] =
    X[s*q + j]); indices border-clamped to [0, s*n-1]. d in [-1, s]."""
    if d == -1:
        delta, j = -1, s - 1
    else:
        delta, j = d // s, d % s
    P = planes[j] if delta == 0 else _shift(planes[j], delta, axis)
    n = P.shape[axis]
    if delta == -1:
        # row 0 would read X[-1] -> clamp to X[0] = planes[0][0]
        P = jnp.where(_iota_eq(P.shape, axis, 0),
                      _edge(planes[0], axis, last=False), P)
    elif delta == 1:
        # last row would read X[s*n] -> clamp to X[s*n-1] = planes[s-1][-1]
        P = jnp.where(_iota_eq(P.shape, axis, n - 1),
                      _edge(planes[s - 1], axis, last=True), P)
    return P


def _lerp(planes, s, d, f, axis):
    a = _subtap(planes, s, d, axis)
    if f == 0.0:
        return a
    b = _subtap(planes, s, d + 1, axis)
    return (1.0 - f) * a + f * b


def _fwd_kernel(specs, R_h, R_w, C, out_6d, *refs):
    """specs: per-part (s_h, s_w, taps_h, taps_w). refs: parts..., out.

    Lerps run on fp32 registers (Mosaic's rotate — the shift primitive —
    rejects sub-32-bit lanes, and measured bf16 slice+concat shifts were
    ~15% slower than fp32 rolls from packed-sublane repacking).

    out_6d: write (1, h_b, R_h, w_b, R_w, C) blocks (sublane-strided
    stores at minor-2) instead of (1, h_b, R_h, w_b, R_w*C) lane-blocks —
    the 6D view's NHWC merge is pure outer-dim reshapes, killing the
    post-kernel lane-split reshape (~0.64 ms/step on the B3 teacher
    head) IF Mosaic's strided store doesn't eat the saving (an
    experiment knob; see docs/perf.md)."""
    out_ref = refs[-1]
    for ph in range(R_h):
        accs = [None] * R_w
        for part_ref, (s_h, s_w, taps_h, taps_w) in zip(refs[:-1], specs):
            dh, fh = taps_h[ph]
            th = []
            for jw in range(s_w):
                cols = [part_ref[0, jh, jw].astype(jnp.float32)
                        for jh in range(s_h)]
                th.append(_lerp(cols, s_h, dh, fh, axis=0))
            for pw in range(R_w):
                dw, fw = taps_w[pw]
                p = _lerp(th, s_w, dw, fw, axis=1)
                accs[pw] = p if accs[pw] is None else accs[pw] + p
        for pw in range(R_w):
            if out_6d:
                out_ref[0, :, ph, :, pw, :] = accs[pw].astype(out_ref.dtype)
            else:
                out_ref[0, :, ph, :, pw * C:(pw + 1) * C] = \
                    accs[pw].astype(out_ref.dtype)


def can_use_fused_resize_sum(shapes, out_hw, dtype=None):
    """Eligibility: TPU backend, >=1 strictly-upsampled 4D NHWC part,
    integer ratios sharing a common base grid, lane-aligned C, VMEM,
    and enough work to beat the XLA path (small-batch inference heads
    measured faster unfused — the pallas_call blocks fusion with the
    surrounding head ops, which only pays off once the upsample chain
    itself dominates; batch-1 B0-head fps regressed 798->502 fused)."""
    H, W = out_hw
    if not shapes:
        return False
    b0, _, _, c0 = shapes[0]
    if c0 % 128 or b0 * c0 < 2048:
        return False
    for s in shapes:
        if len(s) != 4 or s[0] != b0 or s[3] != c0:
            return False
        _, h, w, _ = s
        if h == 0 or w == 0 or H % h or W % w or (h, w) == (H, W):
            return False
    h_b = min(s[1] for s in shapes)
    w_b = min(s[2] for s in shapes)
    if any(s[1] % h_b or s[2] % w_b for s in shapes):
        return False
    R_h, R_w = H // h_b, W // w_b
    if R_h * R_w > 64 or w_b < 8:
        return False
    # out block + in blocks (double-buffered, in the parts' dtype —
    # default to 4B so an un-annotated fp32 call can't compile-OOM)
    # + fp32 working planes
    isz = 4 if dtype is None else jnp.dtype(dtype).itemsize
    vmem = 2 * h_b * R_h * w_b * R_w * c0 * isz
    vmem += sum(2 * s[1] * s[2] * c0 * isz for s in shapes)
    vmem += (R_w + max(s[2] // w_b for s in shapes)) * h_b * w_b * c0 * 4
    if vmem > 90 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _resize_sum_ref(parts, out_hw):
    """Unfused reference path (identical math modulo fp32 lerp)."""
    from ..resize import resize
    acc = None
    for p in parts:
        r = resize(p.astype(jnp.float32), size=out_hw, mode='bilinear',
                   align_corners=False)
        acc = r if acc is None else acc + r
    return acc.astype(parts[0].dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_resize_sum(parts, out_hw, interpret=False):
    """sum_k bilinear_upsample(parts[k], out_hw), align_corners=False.

    parts: tuple of NHWC arrays (B, h_k, w_k, C), each an integer factor
    below (H, W). Returns (B, H, W, C) in the parts' dtype.
    """
    return _fwd_impl(parts, out_hw, interpret)


def _fwd_impl(parts, out_hw, interpret):
    H, W = out_hw
    b = parts[0].shape[0]
    c = parts[0].shape[3]
    dtype = parts[0].dtype
    h_b = min(p.shape[1] for p in parts)
    w_b = min(p.shape[2] for p in parts)
    R_h, R_w = H // h_b, W // w_b

    specs = []
    pre = []
    for p in parts:
        _, h, w, _ = p.shape
        s_h, s_w = h // h_b, w // w_b
        r_h, r_w = H // h, W // w
        specs.append((s_h, s_w, tuple(_grid_taps(r_h, R_h)),
                      tuple(_grid_taps(r_w, R_w))))
        # one cheap source-resolution transpose: (B,h,w,C) ->
        # (B, s_h, s_w, h_b, w_b, C) so strided taps become static
        # sub-plane indices inside the kernel
        v = p.reshape(b, h_b, s_h, w_b, s_w, c)
        pre.append(v.transpose(0, 2, 4, 1, 3, 5))

    # experiment knob (measure on chip before defaulting): 6D out blocks
    # make the NHWC merge free but store sublane-strided — docs/perf.md
    out_6d = os.environ.get('SEGDISTILL_RESIZE_SUM_6D') == '1'
    kernel = functools.partial(_fwd_kernel, specs, R_h, R_w, c, out_6d)
    if out_6d:
        out_spec = pl.BlockSpec((1, h_b, R_h, w_b, R_w, c),
                                lambda i: (i, 0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h_b, R_h, w_b, R_w, c), dtype)
    else:
        out_spec = pl.BlockSpec((1, h_b, R_h, w_b, R_w * c),
                                lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h_b, R_h, w_b, R_w * c),
                                         dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_h, s_w, h_b, w_b, c),
                         lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (s_h, s_w, _, _) in specs
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*pre)
    # 5D: dense row-major bitcast (B, h_b, R_h, w_b, R_w*C) == (B, H, W,
    # C) via one lane-split reshape; 6D: pure outer-dim merges (free)
    return out.reshape(b, H, W, c)


def _vjp_fwd(parts, out_hw, interpret):
    return _fwd_impl(parts, out_hw, interpret), parts


def _vjp_bwd(out_hw, interpret, parts, g):
    # gradients take the XLA resize adjoint (identical math; the fused
    # forward only accelerates inference/teacher forwards and the
    # student's forward pass — backward cost is unchanged)
    _, vjp = jax.vjp(lambda ps: _resize_sum_ref(ps, out_hw), parts)
    return vjp(g)


fused_resize_sum.defvjp(_vjp_fwd, _vjp_bwd)
