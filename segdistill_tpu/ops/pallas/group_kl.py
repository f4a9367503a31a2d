"""Fused channel-group KL distillation kernel (Pallas, TPU).

The reference's CGD/CD hot path (``mmseg/models/distillation/losses.py:
95-113``) materializes two (B, C, H_gt, W_gt) fp32 tensors (bilinear resize
of student+teacher logits to GT size), then reshapes to channel groups and
runs softmax+KL over each group — at ADE20K scale that is 2 x 1.26 GB of
fp32 intermediates churned through HBM several times per step (measured:
73% of the whole distillation train step).

This kernel never materializes the upsampled tensors. Per (batch, group)
grid cell the (g, h, w) source blocks live in VMEM and the integer-ratio
bilinear upsample is decomposed into its r_h x r_w *phase planes*:

    R[r*q + p] = (1-f_p) * S[q + d_p] + f_p * S[q + d_p + 1]

so every upsampled value is an edge-clamped shift + lerp of the source —
pure VPU work, no gathers, no interpolation matmuls, no interleaving
(element *order* within a softmax group is irrelevant; only the set
matters). Softmax statistics are accumulated over the phase planes in two
passes (max, then sum-exp + KL terms):

    KL(b,k) = W/Z_t - log Z_t + log Z_s,
    W = sum e_t * [(x_t - m_t) - (x_s - m_s)] / tau

The custom VJP recomputes the phase planes from the tiny source blocks and
the saved per-group stats (m_s, m_t, Z_s, Z_t) and accumulates
dL/dx_s = scale * (p_s - p_t)/tau through the transposed shifts. The
teacher side needs no gradient (stop_gradient).

Numerics match the unfused reference formula to fp32 rounding (same taps,
same clamping, fp32 throughout; the softmax stabilizer is the source-block
max rather than the plane max — algebraically identical by log-sum-exp
shift invariance) — see tests/test_pallas_kernel.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 64 * 1024 * 1024  # headroom under the declared 100MB limit


def _phase_taps(r):
    """For output phase p in [0, r): (delta, frac) with
    src = q + delta + frac, delta in {-1, 0}, frac in [0, 1)."""
    taps = []
    for p in range(r):
        srcf = (p + 0.5) / r - 0.5
        if srcf < 0:
            taps.append((-1, 1.0 + srcf))
        else:
            taps.append((0, srcf))
    return taps


def _roll(x, shift, axis):
    """pltpu.roll with any-sign shift (the primitive wants it >= 0)."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _shift(x, d, axis):
    """x shifted so out[q] = x[q + d], border-clamped. d in {-1, 0, 1}."""
    if d == 0:
        return x
    n = x.shape[axis]
    rolled = _roll(x, -d, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if d == 1:
        return jnp.where(idx == n - 1, x, rolled)
    return jnp.where(idx == 0, x, rolled)


def _unshift_add(acc, g, d, axis):
    """Transpose of `_shift`: scatter-add g back through out[q]=x[q+d]."""
    if d == 0:
        return acc + g
    n = g.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, g.shape, axis)
    if d == 1:
        # fwd: out[q] = x[q+1] (q<n-1), out[n-1] = x[n-1]
        z = jnp.where(idx == 0, 0.0, _roll(g, 1, axis))
        z = z + jnp.where(idx == n - 1, g, 0.0)
    else:
        # fwd: out[q] = x[q-1] (q>0), out[0] = x[0]
        z = jnp.where(idx == n - 1, 0.0, _roll(g, -1, axis))
        z = z + jnp.where(idx == 0, g, 0.0)
    return acc + z


def _lerp_axis(s, d, f, axis):
    """(1-f)*S[q+d] + f*S[q+d+1] along axis, border-clamped."""
    if f == 0.0 and d == 0:
        return s
    a = _shift(s, d, axis)
    b = _shift(s, d + 1, axis)
    return (1.0 - f) * a + f * b


def _fwd_kernel(taps_h, taps_w, tau, xs_ref, xt_ref, kl_ref, stats_ref):
    s_s = xs_ref[0].astype(jnp.float32)
    s_t = xt_ref[0].astype(jnp.float32)

    # softmax stabilizer: every lerped value is a convex combination of
    # source values, so max(source) bounds every phase plane — the exact
    # plane max is unnecessary (log-sum-exp is shift-invariant; any bound
    # that keeps exp() <= 1 is numerically equivalent). This removes the
    # whole r_h*r_w-plane max pass (~1/3 of forward kernel time).
    m_s = jnp.max(s_s)
    m_t = jnp.max(s_t)

    # pass 2: Z_s, Z_t, W
    z_s = jnp.float32(0.0)
    z_t = jnp.float32(0.0)
    w = jnp.float32(0.0)
    inv_tau = 1.0 / tau
    for dh, fh in taps_h:
        ts = _lerp_axis(s_s, dh, fh, 1)
        tt = _lerp_axis(s_t, dh, fh, 1)
        for dw, fw in taps_w:
            rs = _lerp_axis(ts, dw, fw, 2)
            rt = _lerp_axis(tt, dw, fw, 2)
            es = jnp.exp((rs - m_s) * inv_tau)
            et = jnp.exp((rt - m_t) * inv_tau)
            z_s = z_s + jnp.sum(es)
            z_t = z_t + jnp.sum(et)
            w = w + jnp.sum(et * ((rt - m_t) - (rs - m_s))) * inv_tau

    kl_ref[0, 0, 0] = w / z_t - jnp.log(z_t) + jnp.log(z_s)
    stats_ref[0, 0, 0] = m_s
    stats_ref[0, 0, 1] = m_t
    stats_ref[0, 0, 2] = z_s
    stats_ref[0, 0, 3] = z_t


def _bwd_kernel(taps_h, taps_w, tau, scale_ref, xs_ref, xt_ref, stats_ref,
                dxs_ref):
    s_s = xs_ref[0].astype(jnp.float32)
    s_t = xt_ref[0].astype(jnp.float32)
    m_s = stats_ref[0, 0, 0]
    m_t = stats_ref[0, 0, 1]
    inv_zs = 1.0 / stats_ref[0, 0, 2]
    inv_zt = 1.0 / stats_ref[0, 0, 3]
    scale = scale_ref[0, 0]  # gbar * alpha / (num_dist * tau)
    inv_tau = 1.0 / tau

    # Shift-grouped scatter: the lerp transpose sends each phase's g to at
    # most 4 of the 9 (shift_h, shift_w) in {-1,0,1}^2 buckets with scalar
    # weights. Accumulating WEIGHTED g into buckets (4 multiply-adds per
    # phase) and running the 9 unshift transposes ONCE after the phase
    # loop is exact — unshift is linear and independent of the weights —
    # and replaces the per-phase roll/where chains (~40% of the scatter
    # VPU work at 4x4 upsample).
    buckets = {}
    for dh, fh in taps_h:
        ts = _lerp_axis(s_s, dh, fh, 1)
        tt = _lerp_axis(s_t, dh, fh, 1)
        for dw, fw in taps_w:
            rs = _lerp_axis(ts, dw, fw, 2)
            rt = _lerp_axis(tt, dw, fw, 2)
            p_s = jnp.exp((rs - m_s) * inv_tau) * inv_zs
            p_t = jnp.exp((rt - m_t) * inv_tau) * inv_zt
            g = (p_s - p_t) * scale
            for sh, wh in ((dh, 1.0 - fh), (dh + 1, fh)):
                for sw, ww in ((dw, 1.0 - fw), (dw + 1, fw)):
                    wgt = wh * ww
                    if wgt == 0.0:
                        continue
                    v = g if wgt == 1.0 else wgt * g
                    key = (sh, sw)
                    buckets[key] = v if key not in buckets \
                        else buckets[key] + v
    acc = jnp.zeros_like(s_s)
    for (sh, sw), v in sorted(buckets.items()):
        if sw != 0:
            v = _unshift_add(jnp.zeros_like(v), v, sw, 2)
        if sh != 0:
            v = _unshift_add(jnp.zeros_like(v), v, sh, 1)
        acc = acc + v
    dxs_ref[0] = acc.astype(dxs_ref.dtype)


def _fwd_perm_kernel(taps_h, taps_w, tau, g, perm_ref, xs_ref, xt_ref,
                     kl_ref, stats_ref):
    """Per-channel forward: grid (b, k, g), innermost l walks the group's
    channels in shuffled order (the BlockSpec index map reads ``perm`` —
    the channel shuffle costs zero data movement). Group softmax stats are
    carried across the l steps in the revisited ``stats`` block with
    online-softmax rescaling; the source-block max bounds every lerped
    phase value exactly as in ``_fwd_kernel``."""
    del perm_ref  # consumed by the BlockSpec index maps only
    l = pl.program_id(2)
    s = xs_ref[0, 0].astype(jnp.float32)  # (h, w)
    t = xt_ref[0, 0].astype(jnp.float32)
    inv_tau = 1.0 / tau
    cm_s = jnp.max(s)
    cm_t = jnp.max(t)
    first = l == 0
    m_s0 = jnp.where(first, cm_s, stats_ref[0, 0, 0, 0])
    m_t0 = jnp.where(first, cm_t, stats_ref[0, 0, 0, 1])
    z_s0 = jnp.where(first, 0.0, stats_ref[0, 0, 0, 2])
    z_t0 = jnp.where(first, 0.0, stats_ref[0, 0, 0, 3])
    w0 = jnp.where(first, 0.0, stats_ref[0, 0, 0, 4])

    # online-softmax rescale of the running stats to the new maxima.
    # W-term algebra: each accumulated term is E_t*((rt-m_t)-(rs-m_s))/tau;
    # raising m_t/m_s to m_t'/m_s' multiplies E_t by r_t and shifts the
    # bracket by (d_t - d_s)*tau, so W' = r_t*(W + (d_t - d_s)*Z_t).
    m_s = jnp.maximum(m_s0, cm_s)
    m_t = jnp.maximum(m_t0, cm_t)
    r_s = jnp.exp((m_s0 - m_s) * inv_tau)
    r_t = jnp.exp((m_t0 - m_t) * inv_tau)
    d_s = (m_s0 - m_s) * inv_tau
    d_t = (m_t0 - m_t) * inv_tau
    z_s = z_s0 * r_s
    z_t = z_t0 * r_t
    w = r_t * (w0 + (d_t - d_s) * z_t0)

    for dh, fh in taps_h:
        ts = _lerp_axis(s, dh, fh, 0)
        tt = _lerp_axis(t, dh, fh, 0)
        for dw, fw in taps_w:
            rs = _lerp_axis(ts, dw, fw, 1)
            rt = _lerp_axis(tt, dw, fw, 1)
            es = jnp.exp((rs - m_s) * inv_tau)
            et = jnp.exp((rt - m_t) * inv_tau)
            z_s = z_s + jnp.sum(es)
            z_t = z_t + jnp.sum(et)
            w = w + jnp.sum(et * ((rt - m_t) - (rs - m_s))) * inv_tau

    stats_ref[0, 0, 0, 0] = m_s
    stats_ref[0, 0, 0, 1] = m_t
    stats_ref[0, 0, 0, 2] = z_s
    stats_ref[0, 0, 0, 3] = z_t
    stats_ref[0, 0, 0, 4] = w

    @pl.when(l == g - 1)
    def _():
        kl_ref[0, 0, 0, 0] = w / z_t - jnp.log(z_t) + jnp.log(z_s)


def _bwd_perm_kernel(taps_h, taps_w, tau, perm_ref, scale_ref, xs_ref,
                     xt_ref, stats_ref, dxs_ref):
    """Per-channel backward: dL/dx_s of one (shuffled) channel from the
    saved final group stats; the dxs BlockSpec writes the plane back to
    its source channel (the shuffle's scatter is free addressing)."""
    del perm_ref
    s = xs_ref[0, 0].astype(jnp.float32)
    t = xt_ref[0, 0].astype(jnp.float32)
    m_s = stats_ref[0, 0, 0, 0]
    m_t = stats_ref[0, 0, 0, 1]
    inv_zs = 1.0 / stats_ref[0, 0, 0, 2]
    inv_zt = 1.0 / stats_ref[0, 0, 0, 3]
    scale = scale_ref[0, 0]  # gbar / (num_dist * tau)
    inv_tau = 1.0 / tau

    buckets = {}
    for dh, fh in taps_h:
        zs_h = _lerp_axis(s, dh, fh, 0)
        zt_h = _lerp_axis(t, dh, fh, 0)
        for dw, fw in taps_w:
            rs = _lerp_axis(zs_h, dw, fw, 1)
            rt = _lerp_axis(zt_h, dw, fw, 1)
            p_s = jnp.exp((rs - m_s) * inv_tau) * inv_zs
            p_t = jnp.exp((rt - m_t) * inv_tau) * inv_zt
            grad = (p_s - p_t) * scale
            for sh, wh in ((dh, 1.0 - fh), (dh + 1, fh)):
                for sw, ww in ((dw, 1.0 - fw), (dw + 1, fw)):
                    wgt = wh * ww
                    if wgt == 0.0:
                        continue
                    v = grad if wgt == 1.0 else wgt * grad
                    key = (sh, sw)
                    buckets[key] = v if key not in buckets \
                        else buckets[key] + v
    acc = jnp.zeros_like(s)
    for (sh, sw), v in sorted(buckets.items()):
        if sw != 0:
            v = _unshift_add(jnp.zeros_like(v), v, sw, 1)
        if sh != 0:
            v = _unshift_add(jnp.zeros_like(v), v, sh, 0)
        acc = acc + v
    dxs_ref[0, 0] = acc.astype(dxs_ref.dtype)


def can_use_fused(shape, out_hw, group_size, align_corners=False):
    """Fused-kernel eligibility: TPU backend, integer upsample ratio,
    align_corners False, VMEM budget."""
    if align_corners:
        return False
    if len(shape) != 4:  # token taps (B, N, C) take the unfused path
        return False
    b, c, h, w = shape
    H, W = out_hw
    if h == 0 or w == 0 or H % h or W % w:
        return False
    g = min(group_size, c + (-c) % group_size)
    # Peak per-tile VMEM is set by the BACKWARD's shift-bucket scatter
    # (_bwd_kernel): 2 upcast input planes + up to 9 (shift_h, shift_w)
    # fp32 bucket accumulators + ~4 live lerp temporaries + the output
    # accumulator — model it as 16 fp32 (g, h, w) planes (the analogue of
    # can_use_fused_ce's 14*ct term). The kernels declare a 100MB Mosaic
    # vmem limit; _VMEM_BUDGET keeps headroom under it.
    if 16 * g * h * w * 4 > _VMEM_BUDGET:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_group_kl(xs, xt, out_hw, group_size, tau, interpret=False):
    """alpha-free CGD loss: mean over (b, group) of group-softmax KL at
    ``out_hw`` resolution. xs/xt: (B, C, h, w) fp32 NCHW (the reference
    loss layout)."""
    loss, _ = _fused_fwd(xs, xt, out_hw, group_size, tau, interpret)
    return loss


def _prep(xs, group_size):
    b, c, h, w = xs.shape
    pad = (-c) % group_size
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.full((b, pad, h, w), -1e9, xs.dtype)], axis=1)
    k = (c + pad) // group_size
    return xs.reshape(b * k, group_size, h, w), k


def _fused_fwd(xs, xt, out_hw, group_size, tau, interpret):
    b = xs.shape[0]
    # native-dtype inputs (bf16 halves HBM traffic); per-tile fp32 upcast
    # inside the kernel keeps values bit-identical to upcast-then-load
    xs_p, k = _prep(xs, group_size)
    xt_p, _ = _prep(xt, group_size)
    g, h, w = xs_p.shape[1:]
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))

    kernel = functools.partial(_fwd_kernel, taps_h, taps_w, float(tau))
    kl, stats = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * k, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * k, 1, 4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs_p, xt_p)
    num_dist = b * k
    loss = jnp.sum(kl) / num_dist
    return loss, (xs, xt, stats)


def _fused_bwd(out_hw, group_size, tau, interpret, residuals, gbar):
    xs, xt, stats = residuals
    b = xs.shape[0]
    c = xs.shape[1]
    xs_p, k = _prep(xs, group_size)
    xt_p, _ = _prep(xt, group_size)
    g, h, w = xs_p.shape[1:]
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))
    num_dist = b * k
    scale = (gbar / (num_dist * tau)).astype(jnp.float32).reshape(1, 1)

    kernel = functools.partial(_bwd_kernel, taps_h, taps_w, float(tau))
    dxs_p = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * k, g, h, w), xs_p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scale, xs_p, xt_p, stats)
    dxs = dxs_p.reshape(b, k * g, h, w)[:, :c]
    return dxs.astype(xs.dtype), jnp.zeros_like(xt)


fused_group_kl.defvjp(_fused_fwd, _fused_bwd)


def _pad_groups(x, group_size):
    """Pad C to a multiple of group_size with -1e9 planes (no reshape)."""
    b, c, h, w = x.shape
    pad = (-c) % group_size
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((b, pad, h, w), -1e9, x.dtype)], axis=1)
    return x


def _perm_full(perm, c, c_pad):
    """Shuffled-position -> source-channel map, pad slots appended (the
    reference shuffles the C real channels, THEN pads: losses.py:35-42,
    95-101 — pad channels form the tail of the last group)."""
    perm = perm.astype(jnp.int32)
    if c_pad > c:
        perm = jnp.concatenate([perm,
                                jnp.arange(c, c_pad, dtype=jnp.int32)])
    return perm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_kl_shuffled(xs, xt, perm, out_hw, group_size, tau,
                            interpret=False):
    """``fused_group_kl`` with the reference's channel shuffle folded into
    the kernel's block addressing (zero data movement).

    The unfused pipeline gathers both (B, C, h, w) maps with a traced
    permutation (``x[:, idx]``, ref losses.py:35-42) — XLA compiles that
    to a full gather (fwd, both maps) + scatter-add (bwd) plus layout
    copies, paid on EVERY step even though the permutation is fresh only
    on interval steps. Here ``perm`` (shuffled position -> source
    channel, int32 (C,)) rides as a scalar-prefetch operand and the
    BlockSpec index maps read it: the kernel walks each group's channels
    in shuffled order via DMA addressing, and the backward writes each
    gradient plane straight back to its source channel. Group softmax
    stats are accumulated across the per-channel grid steps with
    online-softmax rescaling (exact; log-sum-exp shift invariance)."""
    loss, _ = _fused_fwd_perm(xs, xt, perm, out_hw, group_size, tau,
                              interpret)
    return loss


def _fused_fwd_perm(xs, xt, perm, out_hw, group_size, tau, interpret):
    b, c, h, w = xs.shape
    xs_p = _pad_groups(xs, group_size)
    xt_p = _pad_groups(xt, group_size)
    c_pad = xs_p.shape[1]
    g = group_size
    k = c_pad // g
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))
    pf = _perm_full(perm, c, c_pad)

    kernel = functools.partial(_fwd_perm_kernel, taps_h, taps_w,
                               float(tau), g)
    chan = lambda bi, j, l, perm_ref: (bi, perm_ref[j * g + l], 0, 0)
    kl, stats = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, k, g),
            in_specs=[
                pl.BlockSpec((1, 1, h, w), chan,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h, w), chan,
                             memory_space=pltpu.VMEM),
            ],
            # trailing unit/full dims: the TPU lowering requires the
            # last two block dims be full-array (or (8,128)-divisible)
            out_specs=[
                pl.BlockSpec((1, 1, 1, 1),
                             lambda bi, j, l, p: (bi, j, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 8),
                             lambda bi, j, l, p: (bi, j, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 1, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pf, xs_p, xt_p)
    num_dist = b * k
    loss = jnp.sum(kl) / num_dist
    return loss, (xs, xt, perm, stats)


def _fused_bwd_perm(out_hw, group_size, tau, interpret, residuals, gbar):
    xs, xt, perm, stats = residuals
    b, c, h, w = xs.shape
    xs_p = _pad_groups(xs, group_size)
    xt_p = _pad_groups(xt, group_size)
    c_pad = xs_p.shape[1]
    g = group_size
    k = c_pad // g
    rh, rw = out_hw[0] // h, out_hw[1] // w
    taps_h = tuple(_phase_taps(rh))
    taps_w = tuple(_phase_taps(rw))
    pf = _perm_full(perm, c, c_pad)
    num_dist = b * k
    scale = (gbar / (num_dist * tau)).astype(jnp.float32).reshape(1, 1)

    kernel = functools.partial(_bwd_perm_kernel, taps_h, taps_w,
                               float(tau))
    chan = lambda bi, j, l, perm_ref: (bi, perm_ref[j * g + l], 0, 0)
    dxs_p = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, k, g),
            in_specs=[
                pl.BlockSpec((1, 1), lambda bi, j, l, p: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, h, w), chan,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h, w), chan,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, 8),
                             lambda bi, j, l, p: (bi, j, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            # bijection: each dxs channel plane is written exactly once,
            # at its source position — the shuffle's scatter is free
            out_specs=pl.BlockSpec((1, 1, h, w), chan,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, h, w), xs_p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pf, scale, xs_p, xt_p, stats)
    dxs = dxs_p[:, :c]
    # int cotangent mirrors fused_seg_ce's labels convention
    return dxs.astype(xs.dtype), jnp.zeros_like(xt), jnp.zeros_like(perm)


fused_group_kl_shuffled.defvjp(_fused_fwd_perm, _fused_bwd_perm)


def group_kl_reference(xs, xt, out_hw, group_size, tau):
    """Unfused reference implementation (identical math) for fallback +
    testing. xs/xt NCHW."""
    from ..resize import resize_nchw
    from jax.scipy.special import xlogy

    xs = resize_nchw(xs.astype(jnp.float32), size=out_hw, mode='bilinear',
                     align_corners=False)
    xt = resize_nchw(xt.astype(jnp.float32), size=out_hw, mode='bilinear',
                     align_corners=False)
    b, c, hh, ww = xs.shape
    pad = (-c) % group_size
    if pad:
        fill = jnp.full((b, pad, hh, ww), -1e9, xs.dtype)
        xs = jnp.concatenate([xs, fill], axis=1)
        xt = jnp.concatenate([xt, fill], axis=1)
        c += pad
    xs = xs.reshape(b, c // group_size, -1)
    xt = xt.reshape(b, c // group_size, -1)
    log_s = jax.nn.log_softmax(xs / tau, axis=-1)
    p_t = jax.nn.softmax(xt / tau, axis=-1)
    kld = jnp.sum(xlogy(p_t, p_t) - p_t * log_s)
    return kld / (xs.size / xs.shape[-1])
