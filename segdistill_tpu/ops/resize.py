"""Interpolation ops with exact torch ``F.interpolate`` semantics, TPU-first.

The reference (``mmseg/ops/wrappers.py:8-29``) routes every model-internal
rescale through ``resize()`` = ``F.interpolate``. Numerical parity of
``align_corners`` handling matters for mIoU, so instead of
``jax.image.resize`` (whose 'linear' method antialiases on downsample —
different math), bilinear interpolation is expressed as two small dense
matmuls built from interpolation weights computed at trace time. Dense
matmuls map straight onto the MXU and XLA fuses the pair.

Layout is NHWC (TPU-native). ``resize_nchw`` adapts NCHW callers (the
distillation losses keep the reference's NCHW math).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# fp32 fidelity on the MXU — the distill losses are fp32 islands
_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=512)
def _linear_taps(in_size, out_size, align_corners):
    """Bilinear source taps, torch semantics: (i0, i1, frac) arrays of
    length out_size. Bilinear (no antialias) is always 2-tap per axis —
    both for up- and downsampling."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) \
            / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros(1, dtype=np.float64)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) \
            * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = src - i0  # float64; consumers cast to compute dtype
    return i0, i1, frac


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size, out_size, align_corners):
    """(out_size, in_size) dense interpolation matrix (MXU path)."""
    i0, i1, frac = _linear_taps(in_size, out_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - frac)
    np.add.at(mat, (rows, i1), frac)
    return mat


@functools.lru_cache(maxsize=256)
def _nearest_index(in_size, out_size):
    """torch 'nearest' (asymmetric) source indices."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def _resize_axis(xf, axis, out_size, align_corners, bf16=False):
    """Bilinear resize of one spatial axis.

    Integer-ratio upsampling (the model's x2/x4/x8 paths and the distill
    loss's feature->GT upsample) uses shift + lerp + interleave: pure
    elementwise VPU work, no gathers (TPU gathers are slow) and no dense
    interpolation matmul (out*in MACs/element on the MXU dominated the
    distill step). Everything else falls back to the dense-matrix MXU path.
    """
    in_size = xf.shape[axis]
    # measured on v5e: the dense interpolation matmul (MXU) beats both
    # gather-lerp (TPU gathers: 5x whole-model slowdown) and
    # shift+lerp+interleave (stack/reshape relayouts: 1.6x slowdown) —
    # keep the MXU path; the fused Pallas loss kernel avoids the big
    # fp32 resize entirely on the distill hot path.
    use_interleave = False
    r = out_size // in_size if in_size else 0
    if (use_interleave and not align_corners and in_size
            and out_size == r * in_size and r > 1):
        # per-phase taps: src = q + (p+0.5)/r - 0.5
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(xf, 0, 1, axis=axis),
             jax.lax.slice_in_dim(xf, 0, in_size - 1, axis=axis)],
            axis=axis)  # S[q-1], edge-clamped
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(xf, 1, in_size, axis=axis),
             jax.lax.slice_in_dim(xf, in_size - 1, in_size, axis=axis)],
            axis=axis)  # S[q+1], edge-clamped
        phases = []
        for p in range(r):
            srcf = (p + 0.5) / r - 0.5
            if srcf < 0:
                phases.append((1.0 + srcf) * xf + (-srcf) * lo)
            else:
                phases.append((1.0 - srcf) * xf + srcf * hi)
        stacked = jnp.stack(phases, axis=axis + 1)  # (..., in, r, ...)
        new_shape = list(xf.shape)
        new_shape[axis] = out_size
        out = stacked.reshape(new_shape)
        # torch clamps src into [0, in-1]: identical here since edge
        # phases reuse the clamped lo/hi rows
        return out
    mat = jnp.asarray(_linear_matrix(in_size, out_size, align_corners),
                      dtype=xf.dtype)
    if bf16:
        mat = mat.astype(jnp.bfloat16)
        eq = 'oh,bhwc->bowc' if axis == 1 else 'ow,bhwc->bhoc'
        return jnp.einsum(eq, mat, xf,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    if axis == 1:
        return jnp.einsum('oh,bhwc->bowc', mat, xf, precision=_HIGHEST)
    return jnp.einsum('ow,bhwc->bhoc', mat, xf, precision=_HIGHEST)


def _out_size(shape_hw, size, scale_factor):
    if size is not None:
        if isinstance(size, int):
            return (size, size)
        return tuple(int(s) for s in size)
    if scale_factor is None:
        raise ValueError('either size or scale_factor must be given')
    if isinstance(scale_factor, (int, float)):
        scale_factor = (scale_factor, scale_factor)
    # torch floors the scaled size
    return tuple(int(np.floor(s * f)) for s, f in zip(shape_hw, scale_factor))


def resize(x, size=None, scale_factor=None, mode='bilinear',
           align_corners=False, warning=False):
    """Resize NHWC (or HW-trailing-channel-free 3D ``(B, H, W)``) arrays.

    Matches ``torch.nn.functional.interpolate`` for ``mode`` in
    {'bilinear', 'nearest'} with no antialiasing.
    """
    del warning
    squeeze = False
    if x.ndim == 3:  # (B, H, W) -> (B, H, W, 1)
        x = x[..., None]
        squeeze = True
    if x.ndim != 4:
        raise ValueError(f'expected 4D NHWC input, got shape {x.shape}')
    h, w = x.shape[1], x.shape[2]
    out_h, out_w = _out_size((h, w), size, scale_factor)

    if mode == 'nearest':
        if align_corners:
            raise ValueError('align_corners not supported for nearest')
        hi = _nearest_index(h, out_h)
        wi = _nearest_index(w, out_w)
        out = x[:, hi][:, :, wi]
    elif mode in ('bilinear', 'linear'):
        ac = bool(align_corners)
        dtype = x.dtype
        # bf16 inputs stay bf16 with fp32 accumulation: upcasting already-
        # rounded activations buys no precision and forces the ~6x-cost
        # fp32-HIGHEST matmul decomposition on the MXU. fp32 inputs (the
        # loss/eval parity paths) keep exact fp32 interpolation.
        if dtype == jnp.bfloat16:
            xf = x
            if out_h != h:
                xf = _resize_axis(xf, 1, out_h, ac, bf16=True)
            if out_w != w:
                xf = _resize_axis(xf, 2, out_w, ac, bf16=True)
            out = xf.astype(dtype)
        else:
            # >= fp32: f64 under jax_enable_x64 stays f64 (parity gates)
            cdt = jnp.promote_types(dtype, jnp.float32)
            xf = x.astype(cdt)
            if out_h != h:
                xf = _resize_axis(xf, 1, out_h, ac)
            if out_w != w:
                xf = _resize_axis(xf, 2, out_w, ac)
            out = xf.astype(dtype) if dtype != cdt else xf
    else:
        raise ValueError(f'unsupported resize mode: {mode}')

    if squeeze:
        out = out[..., 0]
    return out


def resize_nchw(x, size=None, scale_factor=None, mode='bilinear',
                align_corners=False, warning=False):
    """NCHW adapter over :func:`resize` (reference losses use NCHW math)."""
    x = jnp.transpose(x, (0, 2, 3, 1))
    x = resize(x, size=size, scale_factor=scale_factor, mode=mode,
               align_corners=align_corners, warning=warning)
    return jnp.transpose(x, (0, 3, 1, 2))
