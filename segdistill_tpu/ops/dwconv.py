"""Depthwise 2-D convolution as an unrolled tap-sum (TPU).

XLA's grouped-convolution lowering with ``feature_group_count == C`` is
pathological on TPU at these shapes: measured 8-500 ms standalone (and
4.7 ms/op inside the fp32 train step — 84 ms/step across teacher B3's
18 stage-3 blocks) for a 3x3 depthwise over f32[8,32,32,1280], an op
whose speed-of-light is ~0.5 ms of HBM traffic. The MXU cannot help a
depthwise conv anyway (1 MAC per weight per pixel — it is pure VPU
work), so the right TPU form is the unrolled tap sum

    y[h, w, c] = sum_{dy, dx} x[s*h + d*dy - p, s*w + d*dx - p, c] * k[dy, dx, c]

i.e. kh*kw shifted strided slices of the zero-padded input, each
multiplied by a per-channel weight row and accumulated in fp32. XLA
fuses the whole thing into one elementwise pass (kh*kw reads, 1 write)
that runs at HBM speed: 0.7-3 ms for the shapes above, a 6-600x win.
Autodiff stays in elementwise land too — the transpose of pad+slice is
slice+pad, so the backward never touches the bad conv path either.

Used by MiT's Mix-FFN DWConv (ref mix_transformer.py:376-387) and every
true-depthwise ConvModule (MobileNetV2/V3, FastSCNN), replacing
``nn.Conv(feature_group_count=C)`` with identical explicit-padding
semantics and the identical (kh, kw, 1, C) HWIO param layout.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _tap_sum(x, w, b, stride, padding, dilation):
    """The unrolled-tap forward: kh*kw shifted strided slices, fp32
    accumulation, one fused elementwise pass."""
    kh, kw = w.shape[:2]
    sh, sw = stride
    ph, pw = padding
    dh, dw_ = dilation
    B, H, W, C = x.shape
    out_h = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    out_w = (W + 2 * pw - dw_ * (kw - 1) - 1) // sw + 1
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    # accumulate at >= f32 (f64 stays f64 under jax_enable_x64)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    wf = w.astype(acc)
    out = None
    for dy in range(kh):
        y0 = dy * dh
        for dx in range(kw):
            x0 = dx * dw_
            tap = xp[:, y0:y0 + sh * (out_h - 1) + 1:sh,
                     x0:x0 + sw * (out_w - 1) + 1:sw, :]
            term = tap.astype(acc) * wf[dy, dx, 0]
            out = term if out is None else out + term
    out = out + b.astype(acc)
    return out.astype(x.dtype)


def _conv_form(x, w, b, stride, padding, dilation):
    """The same op as lax grouped conv — used only to derive the
    BACKWARD: XLA's conv transpose/wgrad lowerings measured faster
    in-model than autodiff of the tap sum (docs/perf.md round 3)."""
    ph, pw = padding
    y = lax.conv_general_dilated(
        x, w, stride, [(ph, ph), (pw, pw)],
        rhs_dilation=dilation,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1])
    return (y + b.astype(y.dtype)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _dw(x, w, b, stride, padding, dilation):
    return _tap_sum(x, w, b, stride, padding, dilation)


def _dw_fwd(x, w, b, stride, padding, dilation):
    return _tap_sum(x, w, b, stride, padding, dilation), (x, w, b)


def _dw_bwd(stride, padding, dilation, res, g):
    x, w, b = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_: _conv_form(x_, w_, b_, stride, padding,
                                      dilation), x, w, b)
    return vjp(g)


_dw.defvjp(_dw_fwd, _dw_bwd)


def depthwise_conv(x, w, b=None, stride=1, padding=1, dilation=1):
    """Depthwise conv. x (B, H, W, C); w (kh, kw, 1, C) [flax HWIO with
    feature_group_count=C] or (kh, kw, C); b (C,) or None.

    ``padding`` is the explicit symmetric per-side amount (torch
    semantics — NOT 'SAME', whose asymmetric pad differs at stride 2).
    Forward = tap sum (fp32 accumulation, returns x.dtype); backward =
    XLA's conv-autodiff ops (measured faster in-model).
    """
    if w.ndim == 3:
        w = w[:, :, None]
    if w.shape[2] != 1:
        raise ValueError(
            f'depthwise kernel must have in_per_group=1, got {w.shape}')
    if b is None:
        b = jnp.zeros((x.shape[-1],), x.dtype)
    return _dw(x, w, b, to_2tuple(stride), to_2tuple(padding),
               to_2tuple(dilation))


class DepthwiseConv2d(nn.Module):
    """Drop-in for ``nn.Conv(C, (kh, kw), feature_group_count=C)``.
    Param names/shapes ('kernel' (kh, kw, 1, C), 'bias' (C,)) match
    nn.Conv exactly — checkpoints, the torch converter and paramwise
    optimizer rules are unaffected.

    ``use_tap`` selects the tap-sum forward (conv-autodiff backward
    either way). Measured in-model (docs/perf.md round 3): tap wins for
    every fp32 path (2.6x whole-step) and for bf16 *inference* (+9%
    fps), but the bf16 *training* forward is faster through XLA's conv
    fusion — so training call sites pass use_tap=False for bf16 and the
    eval/fp32 sites keep the tap."""
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = (1, 1)
    dilation: tuple = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = None
    use_tap: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = to_2tuple(self.kernel_size)
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kh, kw, 1, self.features), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        bias = None if bias is None else bias.astype(dtype)
        x = x.astype(dtype)
        if self.use_tap:
            return depthwise_conv(
                x, kernel, bias,
                stride=self.strides, padding=self.padding,
                dilation=self.dilation)
        b = (jnp.zeros((self.features,), dtype) if bias is None else bias)
        return _conv_form(x, kernel, b, to_2tuple(self.strides),
                          to_2tuple(self.padding),
                          to_2tuple(self.dilation))
