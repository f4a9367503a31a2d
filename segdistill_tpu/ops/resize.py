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


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size, out_size, align_corners):
    """(out_size, in_size) bilinear interpolation matrix, torch semantics."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros(1, dtype=np.float64)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - frac)
    np.add.at(mat, (rows, i1), frac)
    return mat


@functools.lru_cache(maxsize=256)
def _nearest_index(in_size, out_size):
    """torch 'nearest' (asymmetric) source indices."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


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
        xf = x.astype(jnp.float32)
        if out_h != h:
            mh = jnp.asarray(_linear_matrix(h, out_h, ac))
            # (B,H,W,C) -> (B,out_H,W,C)
            xf = jnp.einsum('oh,bhwc->bowc', mh, xf, precision=_HIGHEST)
        if out_w != w:
            mw = jnp.asarray(_linear_matrix(w, out_w, ac))
            xf = jnp.einsum('ow,bhwc->bhoc', mw, xf, precision=_HIGHEST)
        out = xf.astype(dtype) if dtype != jnp.float32 else xf
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
