"""Golden-value tests for the distillation losses against an independent
torch oracle implementing the reference formulas
(mmseg/models/distillation/losses.py:9-238). The reference itself ships NO
tests for these (SURVEY §4) — BASELINE demands loss parity to tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segdistill_tpu.distill import (ATLoss, CDLoss, CGDLoss, CGDLossWS,
                                    IFVDLoss, KLDLoss, PDLoss)

torch.manual_seed(0)


def _torch_kld_pipeline(xs, xt, gt_hw, tau, alpha, transform=None,
                        group_size=None, do_resize=True):
    """Oracle: the documented KLD pipeline (resize -> transform ->
    softmax(tau) -> KL sum / num_distributions) * alpha."""
    xs, xt = torch.from_numpy(xs), torch.from_numpy(xt)
    if do_resize:
        xs = F.interpolate(xs, size=gt_hw, mode='bilinear',
                           align_corners=False)
        xt = F.interpolate(xt, size=gt_hw, mode='bilinear',
                           align_corners=False)

    def tr(x):
        B, C, H, W = x.shape
        if transform == 'pixel':
            return x.permute(0, 2, 3, 1).reshape(B, H * W, C)
        if transform == 'channel':
            g = group_size
            if C % g != 0:
                n = g - C % g
                pad = torch.full((B, n, H, W), -1e9)
                x = torch.cat([x, pad], dim=1)
                C += n
            return x.reshape(B, C // g, -1)
        return x

    xs, xt = tr(xs), tr(xt)
    log_s = F.log_softmax(xs / tau, dim=-1)
    p_t = F.softmax(xt / tau, dim=-1)
    kld = F.kl_div(log_s, p_t, reduction='sum')
    return alpha * kld / (log_s.numel() / log_s.shape[-1])


def _data(c_s=19, c_t=19, hw=16, gt_hw=32):
    rng = np.random.RandomState(42)
    xs = rng.randn(2, c_s, hw, hw).astype(np.float32)
    xt = rng.randn(2, c_t, hw, hw).astype(np.float32)
    gt = rng.randint(0, 19, (2, gt_hw, gt_hw)).astype(np.int32)
    return xs, xt, gt


def test_pd_loss_matches_oracle():
    xs, xt, gt = _data()
    got = float(PDLoss()(xs, xt, gt, step=1))
    ref = float(_torch_kld_pipeline(xs, xt, (32, 32), tau=1, alpha=1,
                                    transform='pixel'))
    assert got == pytest.approx(ref, rel=1e-4)


def test_cd_loss_matches_oracle():
    xs, xt, gt = _data()
    got = float(CDLoss()(xs, xt, gt, step=1))
    ref = float(_torch_kld_pipeline(xs, xt, (32, 32), tau=1, alpha=1,
                                    transform='channel', group_size=1))
    assert got == pytest.approx(ref, rel=1e-4)


@pytest.mark.parametrize('group_size', [1, 5, 10])
def test_cgd_loss_matches_oracle_no_shuffle_step(group_size):
    """At steps where step % 1000 != 0 the shuffle is a no-op
    (ref losses.py:38) — compare directly."""
    xs, xt, gt = _data(c_s=19, c_t=19)
    loss = CGDLoss(group_size=group_size, alpha=3, tau=2)
    got = float(loss(xs, xt, gt, step=7))
    ref = float(_torch_kld_pipeline(xs, xt, (32, 32), tau=2, alpha=3,
                                    transform='channel',
                                    group_size=group_size))
    assert got == pytest.approx(ref, rel=1e-4)


def test_cgd_group_padding_minus1e9():
    """19 channels, group 5 -> pad 1 channel with -1e9; padded entries must
    contribute exactly zero probability mass."""
    xs, xt, gt = _data()
    got = float(CGDLoss(group_size=5, alpha=3, tau=2)(xs, xt, gt, step=3))
    ref = float(_torch_kld_pipeline(xs, xt, (32, 32), tau=2, alpha=3,
                                    transform='channel', group_size=5))
    assert np.isfinite(got)
    assert got == pytest.approx(ref, rel=1e-4)


def test_cgd_shuffle_shared_permutation():
    """On shuffle steps the SAME permutation must hit student and teacher:
    with xs == xt the loss must be invariant under the shuffle."""
    xs, _, gt = _data()
    loss = CGDLoss(group_size=19, alpha=1, tau=2)
    import jax
    on = float(loss(xs, xs, gt, step=1000, rng=jax.random.key(1)))
    off = float(loss(xs, xs, gt, step=999, rng=jax.random.key(1)))
    # identical inputs -> KL(p||p) ~ 0 regardless of permutation
    assert on == pytest.approx(0.0, abs=1e-5)
    assert off == pytest.approx(0.0, abs=1e-5)


def test_cgd_shuffle_changes_grouping():
    """On a shuffle step with group_size < C the grouping changes, so the
    loss value must differ from the unshuffled one (distinct inputs)."""
    xs, xt, gt = _data()
    import jax
    loss = CGDLoss(group_size=5, alpha=3, tau=2)
    on = float(loss(xs, xt, gt, step=1000, rng=jax.random.key(1)))
    off = float(loss(xs, xt, gt, step=999, rng=jax.random.key(1)))
    assert on != pytest.approx(off, rel=1e-6)


def test_cgdws_alpha_schedule():
    loss = CGDLossWS()
    assert float(loss.alpha_at(2000)) == pytest.approx(3.0)
    assert float(loss.alpha_at(1000)) == pytest.approx(1.5)
    assert float(loss.alpha_at(115000)) == pytest.approx(1.5)
    assert float(loss.alpha_at(120000)) == 0.0
    assert float(loss.alpha_at(150000)) == 0.0


def test_at_loss_matches_oracle():
    xs, xt, gt = _data(hw=16, gt_hw=16)
    got = float(ATLoss()(xs, xt, gt, step=1))
    ts, tt = torch.from_numpy(xs), torch.from_numpy(xt)
    loss_at = F.mse_loss(ts.mean(dim=1), tt.mean(dim=1))
    log_s = F.log_softmax(ts, dim=1)
    p_t = F.softmax(tt, dim=1)
    loss_pd = F.kl_div(log_s, p_t, reduction='sum') \
        / (ts.numel() / ts.shape[1])
    assert got == pytest.approx(float(loss_at + loss_pd), rel=1e-4)


def test_ifvd_loss_matches_oracle():
    """Oracle implements the documented per-class center construction with
    an explicit loop (ref losses.py:226-230)."""
    rng = np.random.RandomState(3)
    C = 6
    xs = rng.randn(2, C, 8, 8).astype(np.float32)
    xt = rng.randn(2, C, 8, 8).astype(np.float32)
    gt = rng.randint(0, C, (2, 1, 8, 8)).astype(np.int32)

    got = float(IFVDLoss()(xs, xt, gt, step=1))

    fs, ft = torch.from_numpy(xs), torch.from_numpy(xt)
    tar = torch.from_numpy(gt).float()
    log_s = F.log_softmax(fs, dim=1)
    p_t = F.softmax(ft, dim=1)
    loss_pd = F.kl_div(log_s, p_t, reduction='sum') \
        / (fs.numel() / fs.shape[1])

    def centers(feat):
        t = tar.expand(feat.size())
        center = feat.clone()
        for i in range(C):
            mask = (t == i).float()
            mu = (mask * feat).sum(-1).sum(-1) \
                / (mask.sum(-1).sum(-1) + 1e-6)
            center = (1 - mask) * center \
                + mask * mu.unsqueeze(-1).unsqueeze(-1)
        return center

    cos = torch.nn.CosineSimilarity(dim=1)
    loss_ifvd = 10 * F.mse_loss(cos(fs, centers(fs)), cos(ft, centers(ft)))
    assert got == pytest.approx(float(loss_ifvd + loss_pd), rel=1e-3)


def test_kld_warmup_modes():
    loss = KLDLoss(alpha=2, tau=1,
                   warmup_config={'mode': 'linear', 'warmup_iters': 100})
    assert float(loss.alpha_at(50)) == pytest.approx(1.0)
    assert float(loss.alpha_at(100)) == pytest.approx(2.0)
    assert float(loss.alpha_at(500)) == pytest.approx(2.0)


def test_paired_layer_config_rejected_at_build_time():
    """Paired-layer criteria (list-valued student_layer) are dead code in
    the reference (losses.py:239-927, opts.py:91-98) — the engine must
    reject them when the config is built, not mid-train-step."""
    from segdistill_tpu.distill import DistillationLoss
    with pytest.raises(NotImplementedError, match='paired-layer'):
        DistillationLoss([{
            'student_layer': ['backbone.block1.0.attn.ATTN',
                              'backbone.block1.0.attn.V'],
            'teacher_layer': ['backbone.block1.0.attn.ATTN',
                              'backbone.block1.0.attn.V'],
            'loss_name': 'KLDLoss',
            'loss_config': {'alpha': 1, 'tau': 1},
        }])
