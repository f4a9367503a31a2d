"""Knowledge-distillation losses — the paper's core math, as pure jittable fns.

Numerical contract replicated from the reference
(``mmseg/models/distillation/losses.py:9-238``), verified by golden-value
tests against an independent torch implementation of the same formulas:

* KLD pipeline: warmup/early-decay of alpha -> bilinear resize of both maps
  to GT size -> channel shuffle (fresh shared permutation only on steps where
  ``step % interval == 0``) -> transform ('pixel': (B,C,H,W)->(B,HW,C);
  'channel': pad C to a multiple of group_size with -1e9 then
  (B, C'/g, g*H*W)) -> ``KL(log_softmax(s/tau) || softmax(t/tau))`` summed
  and divided by the number of distributions (``numel/last_dim``). No tau^2
  factor — the reference has none.
* Presets PD/CD/CGD/CGDWS (losses.py:115-173), ATLoss (:175-197),
  IFVDLoss (:199-238, per-class loop vectorized into one-hot segment means).

All losses take NCHW feature maps (the engine converts NHWC taps) and run in
fp32 — these are fp32 islands inside bf16 training.

Scheduling state (the reference mutates ``self.alpha`` across iterations) is
re-derived as a pure function of the step counter, so loss schedules survive
checkpoint resume for free (the reference needs the ``model.cnt =
runner.iter`` hack, ``apis/train.py:136``).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

from ..ops import resize, resize_nchw


def _kl_div_sum(log_s, prob_t):
    """torch.nn.KLDivLoss(reduction='sum'): sum(t*log(t) - t*log_s),
    with 0*log(0) == 0 (torch uses xlogy)."""
    return jnp.sum(xlogy(prob_t, prob_t) - prob_t * log_s)


class KLDLoss:
    """Configurable KL distillation loss (ref losses.py:9-113)."""

    def __init__(self, alpha=1, tau=1, resize_config=None,
                 shuffle_config=None, transform_config=None,
                 warmup_config=None, earlydecay_config=None):
        self.alpha_0 = float(alpha)
        self.tau = float(tau)
        self.resize_config = resize_config
        self.shuffle_config = shuffle_config
        self.transform_config = transform_config
        self.warmup_config = warmup_config
        self.earlydecay_config = earlydecay_config

    # -- alpha schedule: pure function of the step counter ------------------
    def alpha_at(self, step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.float32(self.alpha_0)
        if self.warmup_config:
            mode = self.warmup_config['mode']
            w = float(self.warmup_config['warmup_iters'])
            if mode == 'linear':
                warm = self.alpha_0 * (step / w)
            elif mode == 'exp':
                warm = jnp.power(self.alpha_0, step / w)
            elif mode == 'jump':
                warm = jnp.float32(0.0)
            else:
                raise ValueError(mode)
            alpha = jnp.where(step < w, warm, alpha)
        if self.earlydecay_config:
            mode = self.earlydecay_config['mode']
            s = float(self.earlydecay_config['earlydecay_start'])
            e = float(self.earlydecay_config['earlydecay_end'])
            if mode == 'linear':
                dec = self.alpha_0 * ((e - step) / (e - s))
            elif mode == 'exp':
                dec = 0.001 * jnp.power(self.alpha_0, (e - step) / (e - s))
            elif mode == 'jump':
                dec = jnp.float32(0.0)
            else:
                raise ValueError(mode)
            alpha = jnp.where((step > s) & (step < e), dec, alpha)
            alpha = jnp.where(step >= e, 0.0, alpha)
        return alpha

    def _resize(self, x, gt_hw):
        return resize_nchw(x, size=gt_hw,
                           mode=self.resize_config['mode'],
                           align_corners=self.resize_config['align_corners'])

    def _shuffle_idx(self, C, step, rng):
        """Shared channel permutation, fresh only on steps hitting the
        interval (ref losses.py:35-42: ``if n_iter % interval == 0``)."""
        interval = self.shuffle_config['interval']
        perm = jax.random.permutation(jax.random.fold_in(rng, step), C)
        return jnp.where(step % interval == 0, perm, jnp.arange(C))

    def _shuffle(self, x_s, x_t, step, rng):
        idx = self._shuffle_idx(x_s.shape[1], step, rng)
        return x_s[:, idx], x_t[:, idx]

    def _transform(self, x):
        B, C, H, W = x.shape
        loss_type = self.transform_config['loss_type']
        if loss_type == 'pixel':
            return x.transpose(0, 2, 3, 1).reshape(B, H * W, C)
        if loss_type == 'channel':
            g = self.transform_config['group_size']
            if C % g != 0:
                n = g - C % g
                pad = jnp.full((B, n, H, W), -1e9, x.dtype)
                x = jnp.concatenate([x, pad], axis=1)
                C = C + n
            return x.reshape(B, C // g, g * H * W)
        raise ValueError(loss_type)

    def _try_fused(self, x_student, x_teacher, gt, step, rng, alpha):
        """Fused Pallas path for the channel-group pipeline: bilinear
        upsample + group softmax + KL in one kernel, never materializing
        the (B, C, H_gt, W_gt) fp32 tensors (ops/pallas/group_kl.py).
        Channel shuffle commutes with the per-channel spatial resize, so it
        is applied to the source maps."""
        from ..ops.pallas import (can_use_fused, can_use_fused_pixel,
                                  fused_group_kl, fused_group_kl_shuffled,
                                  fused_pixel_kl)
        if not self.transform_config:
            return None
        loss_type = self.transform_config['loss_type']
        if self.resize_config:
            if self.resize_config['mode'] != 'bilinear' \
                    or self.resize_config.get('align_corners', False):
                return None
            out_hw = tuple(gt.shape[-2:] if gt.ndim == 4
                           else gt.shape[1:3])
        else:
            out_hw = x_student.shape[-2:]
        if loss_type == 'pixel':
            if not can_use_fused_pixel(x_student.shape, out_hw):
                return None
            # the shared channel shuffle is skipped on this path: the
            # 'pixel' transform softmaxes over C at every pixel, and a
            # permutation applied to BOTH maps permutes terms WITHIN each
            # softmax distribution — the loss value is mathematically
            # invariant (tested in test_pallas_pixel.py), so the fused
            # path drops the gather the unfused parity path still does
            # num_dist = numel/last_dim of the (B, HW, C) pixel transform
            num_dist = x_student.shape[0] * out_hw[0] * out_hw[1]
            return alpha * fused_pixel_kl(x_student, x_teacher, out_hw,
                                          self.tau) / num_dist
        if loss_type != 'channel':
            return None
        g = self.transform_config['group_size']
        if not can_use_fused(x_student.shape, out_hw, g):
            return None
        if self.shuffle_config:
            if rng is None:
                rng = jax.random.key(0)
            # shuffle folded into the kernel's block addressing — the
            # unfused gather/scatter pair (paid every step though the
            # permutation is fresh only on interval steps) disappears
            idx = self._shuffle_idx(x_student.shape[1], step, rng)
            return alpha * fused_group_kl_shuffled(
                x_student, x_teacher, idx, out_hw, g, self.tau)
        return alpha * fused_group_kl(x_student, x_teacher, out_hw, g,
                                      self.tau)

    def __call__(self, x_student, x_teacher, gt, step, rng=None):
        alpha = self.alpha_at(step)

        # the fused kernels take native-dtype (bf16) maps and upcast
        # per-tile in-register — identical values, half the HBM traffic
        fused = self._try_fused(x_student, x_teacher, gt, step, rng, alpha)
        if fused is not None:
            return fused
        x_student = x_student.astype(jnp.float32)
        x_teacher = x_teacher.astype(jnp.float32)

        if self.resize_config:
            gt_hw = gt.shape[-2:] if gt.ndim == 4 else gt.shape[1:3]
            x_student = self._resize(x_student, gt_hw)
            x_teacher = self._resize(x_teacher, gt_hw)
        if self.shuffle_config:
            if rng is None:
                rng = jax.random.key(0)
            x_student, x_teacher = self._shuffle(x_student, x_teacher,
                                                 step, rng)
        if self.transform_config:
            x_student = self._transform(x_student)
            x_teacher = self._transform(x_teacher)

        log_s = jax.nn.log_softmax(x_student / self.tau, axis=-1)
        prob_t = jax.nn.softmax(x_teacher / self.tau, axis=-1)
        num_dist = x_student.size / x_student.shape[-1]
        loss = _kl_div_sum(log_s, prob_t) / num_dist
        return alpha * loss


class PDLoss(KLDLoss):
    """Pixel-wise distillation preset (ref losses.py:115-128)."""

    def __init__(self):
        super().__init__(
            alpha=1, tau=1,
            resize_config={'mode': 'bilinear', 'align_corners': False},
            transform_config={'loss_type': 'pixel'})


class CDLoss(KLDLoss):
    """Channel-wise distillation preset (ref losses.py:130-143)."""

    def __init__(self):
        super().__init__(
            alpha=1, tau=1,
            resize_config={'mode': 'bilinear', 'align_corners': False},
            transform_config={'loss_type': 'channel', 'group_size': 1})


class CGDLoss(KLDLoss):
    """Channel *Group* Distillation — the paper's method
    (ref losses.py:145-158)."""

    def __init__(self, group_size=10, alpha=3, tau=2):
        super().__init__(
            alpha=alpha, tau=tau,
            resize_config={'mode': 'bilinear', 'align_corners': False},
            shuffle_config={'interval': 1000},
            transform_config={'loss_type': 'channel',
                              'group_size': group_size})


class CGDLossWS(KLDLoss):
    """CGD + linear warmup / early decay of alpha (ref losses.py:160-173).

    The reference ctor takes no kwargs, yet its own config
    ``local_configs/exp_tab5/psp_CGD+WS.py:61-64`` passes ``group_size=5`` —
    that config crashes at build time in the reference. We accept the same
    kwargs as ``CGDLoss`` (the evident intent) so the config is buildable.
    """

    def __init__(self, group_size=10, alpha=3, tau=2):
        super().__init__(
            alpha=alpha, tau=tau,
            resize_config={'mode': 'bilinear', 'align_corners': False},
            shuffle_config={'interval': 1000},
            transform_config={'loss_type': 'channel', 'group_size': group_size},
            warmup_config={'mode': 'linear', 'warmup_iters': 2000},
            earlydecay_config={'mode': 'linear', 'earlydecay_start': 110000,
                               'earlydecay_end': 120000})


class ATLoss:
    """Attention transfer: MSE of channel means + per-pixel channel-softmax
    KL (ref losses.py:175-197)."""

    def __call__(self, x_student, x_teacher, gt, step, rng=None):
        x_student = x_student.astype(jnp.float32)
        x_teacher = x_teacher.astype(jnp.float32)
        loss_at = jnp.mean((jnp.mean(x_student, axis=1)
                            - jnp.mean(x_teacher, axis=1)) ** 2)
        log_s = jax.nn.log_softmax(x_student, axis=1)
        prob_t = jax.nn.softmax(x_teacher, axis=1)
        num_dist = x_student.size / x_student.shape[1]
        loss_pd = _kl_div_sum(log_s, prob_t) / num_dist
        return loss_at + loss_pd


class IFVDLoss:
    """Intra-class feature variation distillation (ref losses.py:199-238).

    The reference's O(C) python loop building per-class "center" maps becomes
    a one-hot segment-mean (two einsums) — identical values, one XLA fusion.
    """

    def __call__(self, x_student, x_teacher, gt, step, rng=None):
        feat_s = x_student.astype(jnp.float32)
        feat_t = resize_nchw(x_teacher.astype(jnp.float32),
                             size=feat_s.shape[-2:], mode='bilinear',
                             align_corners=False)
        C = feat_t.shape[1]

        log_s = jax.nn.log_softmax(feat_s, axis=1)
        prob_t = jax.nn.softmax(feat_t, axis=1)
        loss_pd = _kl_div_sum(log_s, prob_t) / (feat_s.size / C)

        # nearest-upsampled GT at feature resolution (ref :222-223)
        gt_map = gt if gt.ndim == 3 else gt[:, 0]
        gt_small = resize(gt_map.astype(jnp.float32)[..., None],
                          size=feat_s.shape[-2:], mode='nearest')[..., 0]
        gt_small = gt_small.astype(jnp.int32)  # (B, h, w)

        def centers(feat):
            valid = (gt_small >= 0) & (gt_small < C)
            onehot = jax.nn.one_hot(jnp.where(valid, gt_small, 0), C,
                                    dtype=jnp.float32) * valid[..., None]
            # class-wise spatial sums / counts
            sums = jnp.einsum('bchw,bhwi->bci', feat, onehot)
            cnts = jnp.sum(onehot, axis=(1, 2))  # (B, i)
            mu = sums / (cnts[:, None, :] + 1e-6)  # (B, C, i)
            idx = jnp.where(valid, gt_small, 0)
            gathered = jnp.take_along_axis(
                mu, idx.reshape(idx.shape[0], 1, -1), axis=2).reshape(
                feat.shape[0], C, *idx.shape[1:])
            return jnp.where(valid[:, None], gathered, feat)

        center_s = centers(feat_s)
        center_t = centers(feat_t)

        def cos(a, b):
            # torch CosineSimilarity(dim=1): per-norm floor at eps=1e-8
            na = jnp.maximum(jnp.linalg.norm(a, axis=1), 1e-8)
            nb = jnp.maximum(jnp.linalg.norm(b, axis=1), 1e-8)
            return jnp.sum(a * b, axis=1) / (na * nb)

        loss_ifvd = 10.0 * jnp.mean((cos(feat_s, center_s)
                                     - cos(feat_t, center_t)) ** 2)
        return loss_ifvd + loss_pd


DISTILL_LOSSES = {
    'KLDLoss': KLDLoss,
    'PDLoss': PDLoss,
    'CDLoss': CDLoss,
    'CGDLoss': CGDLoss,
    'CGDLossWS': CGDLossWS,
    'ATLoss': ATLoss,
    'IFVDLoss': IFVDLoss,
}
