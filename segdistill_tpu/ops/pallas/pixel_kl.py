"""Fused pixel-wise KL distillation kernel (Pallas, TPU).

The 'pixel' transform of KLDLoss (PDLoss, ref losses.py:47-49,115-128):
per-pixel channel-softmax KL(student||teacher) at GT resolution. Same
phase-plane + channel-tile structure as seg_ce.py, with teacher/student
running per-pixel statistics:

    KL_px = W/Z_t - log Z_t + log Z_s
    W = sum_c e_t * [(z_t - m_t) - (z_s - m_s)] / tau

(the per-pixel analogue of group_kl's per-group formula; the reference sums
over ALL pixels — there is no ignore masking in PDLoss.)

Custom VJP: dz_s = unshift(w * (p_s - p_t)/tau * scale); teacher frozen.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .group_kl import _lerp_axis, _phase_taps, _unshift_add
from .seg_ce import _CTILE, _pad_channels


def _stats(z_ref, dh, fh, dw, fw, n_tiles, shape):
    ct = _CTILE

    def maxloop(t, m):
        zt = z_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
        plane = _lerp_axis(_lerp_axis(zt, dh, fh, 1), dw, fw, 2)
        return jnp.maximum(m, jnp.max(plane, axis=0))

    m = jax.lax.fori_loop(0, n_tiles, maxloop,
                          jnp.full(shape, -jnp.inf, jnp.float32))
    return m


def _fwd_kernel(taps_h, taps_w, n_tiles, tau, xs_ref, xt_ref, kl_ref):
    ct = _CTILE
    inv_tau = 1.0 / tau
    shape = xs_ref.shape[2:]
    kl_sum = jnp.float32(0.0)
    pi = 0
    for dh, fh in taps_h:
        for dw, fw in taps_w:
            m_s = _stats(xs_ref, dh, fh, dw, fw, n_tiles, shape)
            m_t = _stats(xt_ref, dh, fh, dw, fw, n_tiles, shape)

            def accum(t, carry):
                zs_sum, zt_sum, w_sum = carry
                zs = xs_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                zt = xt_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                ps = _lerp_axis(_lerp_axis(zs, dh, fh, 1), dw, fw, 2)
                pt = _lerp_axis(_lerp_axis(zt, dh, fh, 1), dw, fw, 2)
                es = jnp.exp((ps - m_s[None]) * inv_tau)
                et = jnp.exp((pt - m_t[None]) * inv_tau)
                zs_sum = zs_sum + jnp.sum(es, axis=0)
                zt_sum = zt_sum + jnp.sum(et, axis=0)
                w_sum = w_sum + jnp.sum(
                    et * ((pt - m_t[None]) - (ps - m_s[None])),
                    axis=0) * inv_tau
                return zs_sum, zt_sum, w_sum

            z_s, z_t, w = jax.lax.fori_loop(
                0, n_tiles, accum,
                (jnp.zeros(shape, jnp.float32),
                 jnp.zeros(shape, jnp.float32),
                 jnp.zeros(shape, jnp.float32)))
            kl_sum += jnp.sum(w / z_t - jnp.log(z_t) + jnp.log(z_s))
            pi += 1
    kl_ref[0, 0, 0] = kl_sum


def _bwd_kernel(taps_h, taps_w, n_tiles, tau, scale_ref, xs_ref, xt_ref,
                dxs_ref):
    ct = _CTILE
    inv_tau = 1.0 / tau
    shape = xs_ref.shape[2:]
    scale = scale_ref[0, 0] * inv_tau
    dxs_ref[0] = jnp.zeros_like(dxs_ref[0])
    for dh, fh in taps_h:
        for dw, fw in taps_w:
            m_s = _stats(xs_ref, dh, fh, dw, fw, n_tiles, shape)
            m_t = _stats(xt_ref, dh, fh, dw, fw, n_tiles, shape)

            def sums(t, carry):
                zs_sum, zt_sum = carry
                zs = xs_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                zt = xt_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                ps = _lerp_axis(_lerp_axis(zs, dh, fh, 1), dw, fw, 2)
                pt = _lerp_axis(_lerp_axis(zt, dh, fh, 1), dw, fw, 2)
                zs_sum = zs_sum + jnp.sum(
                    jnp.exp((ps - m_s[None]) * inv_tau), axis=0)
                zt_sum = zt_sum + jnp.sum(
                    jnp.exp((pt - m_t[None]) * inv_tau), axis=0)
                return zs_sum, zt_sum

            z_s, z_t = jax.lax.fori_loop(
                0, n_tiles, sums, (jnp.zeros(shape, jnp.float32),
                                   jnp.zeros(shape, jnp.float32)))
            inv_zs = 1.0 / z_s
            inv_zt = 1.0 / z_t

            def gradloop(t, _):
                zs = xs_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                zt = xt_ref[0, pl.ds(t * ct, ct)].astype(jnp.float32)
                ps = _lerp_axis(_lerp_axis(zs, dh, fh, 1), dw, fw, 2)
                pt = _lerp_axis(_lerp_axis(zt, dh, fh, 1), dw, fw, 2)
                prob_s = jnp.exp((ps - m_s[None]) * inv_tau) * inv_zs[None]
                prob_t = jnp.exp((pt - m_t[None]) * inv_tau) * inv_zt[None]
                g = (prob_s - prob_t) * scale
                if fw != 0.0 or dw != 0:
                    gw = jnp.zeros_like(g)
                    gw = _unshift_add(gw, (1.0 - fw) * g, dw, 2)
                    gw = _unshift_add(gw, fw * g, dw + 1, 2)
                else:
                    gw = g
                if fh != 0.0 or dh != 0:
                    gh = jnp.zeros_like(gw)
                    gh = _unshift_add(gh, (1.0 - fh) * gw, dh, 1)
                    gh = _unshift_add(gh, fh * gw, dh + 1, 1)
                else:
                    gh = gw
                dxs_ref[0, pl.ds(t * ct, ct)] += gh
                return 0

            jax.lax.fori_loop(0, n_tiles, gradloop, 0)


def can_use_fused_pixel(shape, out_hw, align_corners=False):
    if align_corners:
        return False
    if len(shape) != 4:  # token taps (B, N, C) take the unfused path
        return False
    b, c, h, w = shape
    H, W = out_hw
    if h == 0 or w == 0 or H % h or W % w:
        return False
    c_pad = c + (-c) % _CTILE
    if (3 * c_pad + 10 * _CTILE) * h * w * 4 > 90 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_pixel_kl(xs, xt, out_hw, tau, interpret=False):
    """Sum over pixels of per-pixel channel-softmax KL at out_hw; divide by
    B*H*W outside (= numel/last_dim for the 'pixel' transform)."""
    out, _ = _fwd(xs, xt, out_hw, tau, interpret)
    return out


def _fwd(xs, xt, out_hw, tau, interpret):
    zs = _pad_channels(xs.astype(jnp.float32), _CTILE)
    zt = _pad_channels(xt.astype(jnp.float32), _CTILE)
    b, c, h, w = zs.shape
    n_tiles = c // _CTILE
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))
    kernel = functools.partial(_fwd_kernel, taps_h, taps_w, n_tiles,
                               float(tau))
    kl = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zs, zt)
    return jnp.sum(kl), (xs, xt)


def _bwd(out_hw, tau, interpret, residuals, gbar):
    xs, xt = residuals
    zs = _pad_channels(xs.astype(jnp.float32), _CTILE)
    zt = _pad_channels(xt.astype(jnp.float32), _CTILE)
    b, c, h, w = zs.shape
    n_tiles = c // _CTILE
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))
    scale = gbar.astype(jnp.float32).reshape(1, 1)
    kernel = functools.partial(_bwd_kernel, taps_h, taps_w, n_tiles,
                               float(tau))
    dz = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scale, zs, zt)
    dz = dz[:, :xs.shape[1]]
    return dz.astype(xs.dtype), jnp.zeros_like(xt)


fused_pixel_kl.defvjp(_fwd, _bwd)
