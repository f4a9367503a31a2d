"""SDModuleMT aligned-path trajectory parity vs a torch twin
(VERDICT r4, Weak #3 / Next #6).

The single-teacher flagship families passed seeded-SGD trajectory gates
(test_distill_chain_parity.py); this file applies the same gate to the
multi-teacher ALIGNED path (ref SD_structure.py:226-355, opts.py:129-209:
``len(teacher_features) == len(distillation)`` — entry i pairs with
teacher i via the index-suffixed tap name, loss key
``loss_{s}<->{t}{i}_{i}``), plus a gradient-parity check of the
``channel_nums`` 1x1 adapter against a torch ``nn.Conv1d`` twin (the
reference documents the contract at opts.py:25-27 and ships the Conv1d
at opts.py:115-125 but never wires it — the twin implements the
documented contract).

The torch oracle is built from the reference's OWN ``ExtractorMT`` /
``DistillationLossMT`` (imported verbatim via ref_shims). Teacher runs in
eval mode with stochastic depth at p=0 on both sides (the documented
deliberate divergence — see test_distill_chain_parity.py docstring).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

import ref_shims

if not ref_shims.reference_available():  # pragma: no cover
    pytest.skip('reference checkout not present', allow_module_level=True)

REF = ref_shims.load_reference()

pytestmark = pytest.mark.slow

from test_ref_anchor import (  # noqa: E402
    NORM, RefSegformer, _ref_head, _zero_stochastic)
from test_torch_parity import _randomize  # noqa: E402
from test_distill_chain_parity import _batches, _flax_cfg  # noqa: E402
from segdistill_tpu.convert.torch_loader import (  # noqa: E402
    load_pth_into_variables)
from segdistill_tpu.models import build_segmentor  # noqa: E402

N_CLASSES = 19


class TorchSDMTOracle(torch.nn.Module):
    """The reference SDModuleMT aligned distillation step, rebuilt from
    the reference's own parts (SD_structure.py:226-355)."""

    def __init__(self, student, teachers, distillation):
        super().__init__()
        self.student = student
        self.teachers = torch.nn.ModuleList(teachers)
        for t in self.teachers:
            t.eval()
            for p in t.parameters():
                p.requires_grad = False
        self.extractor = REF.ExtractorMT(student, teachers, distillation)
        self.distillation_loss = REF.DistillationLossMT(distillation)
        self.cnt = 0

    def forward_train(self, img, gt):
        self.cnt += 1
        feats = self.student.backbone(img)
        loss_dict = {f'decode.{k}': v for k, v in
                     self.student.decode_head.forward_train(
                         feats, None, gt, None).items()}
        with torch.no_grad():
            for t in self.teachers:
                t_feats = t.backbone(img)
                t.decode_head.forward_train(t_feats, None, gt, None)
        d = self.distillation_loss(self.extractor.student_features,
                                   self.extractor.teacher_features,
                                   gt, self.cnt)
        loss_dict.update(d)
        return loss_dict

    @staticmethod
    def parse_losses(loss_dict):
        log_vars = {k: v.mean() for k, v in loss_dict.items()}
        total = sum(v for k, v in log_vars.items() if 'loss' in k)
        return total, log_vars


def _mt_distillation():
    """Two aligned entries, one per teacher, with distinct configs so a
    teacher/entry mixup changes the numbers."""
    return [
        {'student_layer': 'decode_head.linear_pred',
         'teacher_layer': 'decode_head.linear_pred',
         'loss_name': 'CGDLoss',
         'loss_config': dict(group_size=10, alpha=3, tau=2)},
        {'student_layer': 'decode_head.linear_pred',
         'teacher_layer': 'decode_head.linear_pred',
         'loss_name': 'CDLoss',
         'loss_config': {}},
    ]


def _build_mt_pair(tmp_path):
    t_student = _zero_stochastic(_randomize(
        RefSegformer(REF.mit_b0(), _ref_head([32, 64, 160, 256])), seed=61))
    t_teachers = [
        _zero_stochastic(_randomize(
            RefSegformer(REF.mit_b1(), _ref_head([64, 128, 320, 512])),
            seed=62 + i))
        for i in range(2)
    ]
    # DistillationLossMT mutates the distillation list (adds 'criterion')
    # — give each side its own copy, like the reference configs do
    oracle = TorchSDMTOracle(t_student, t_teachers,
                             [dict(e) for e in _mt_distillation()])

    mt_cfg = dict(
        type='SDModuleMT',
        cfg_s=_flax_cfg('mit_b0', [32, 64, 160, 256]),
        cfg_t=[_flax_cfg('mit_b1', [64, 128, 320, 512]),
               _flax_cfg('mit_b1', [64, 128, 320, 512])],
        distillation=[dict(e) for e in _mt_distillation()],
        test_cfg=dict(mode='whole'))
    fmodel = build_segmentor(mt_cfg)
    variables = fmodel.init_variables(jax.random.PRNGKey(0),
                                      (1, 64, 64, 3))

    s_path = str(tmp_path / 's.pth')
    torch.save(t_student.state_dict(), s_path)
    variables['student'] = load_pth_into_variables(variables['student'],
                                                   s_path)
    for i, t in enumerate(t_teachers):
        p = str(tmp_path / f't{i}.pth')
        torch.save(t.state_dict(), p)
        variables['teachers'][i] = load_pth_into_variables(
            variables['teachers'][i], p)
    return oracle, fmodel, variables


def test_mt_aligned_trajectory_through_jitted_train_step(tmp_path):
    """5 seeded SGD steps of the 2-teacher aligned path through the
    PRODUCTION jitted train step vs the torch twin: total loss and BOTH
    per-teacher distill components must track, under the reference's MT
    key layout."""
    oracle, fmodel, variables = _build_mt_pair(tmp_path)
    lr = 0.05
    batches = _batches(5, seed=63)
    dkeys = ['loss_decode_head.linear_pred<->decode_head.linear_pred0_0',
             'loss_decode_head.linear_pred<->decode_head.linear_pred1_1']

    opt = torch.optim.SGD(
        [p for p in oracle.student.parameters() if p.requires_grad], lr=lr)
    t_total = []
    t_dist = {k: [] for k in dkeys}
    for img, gt in batches:
        opt.zero_grad()
        loss_dict = oracle.forward_train(
            torch.from_numpy(img), torch.from_numpy(gt)[:, None].long())
        total, log_vars = oracle.parse_losses(loss_dict)
        total.backward()
        opt.step()
        t_total.append(float(total.detach()))
        for k in dkeys:
            t_dist[k].append(float(log_vars[k].detach()))

    from segdistill_tpu.engine import (build_optimizer, build_train_step,
                                       create_train_state)
    tx = build_optimizer(dict(type='SGD', lr=lr, momentum=0.0,
                              weight_decay=0.0),
                         variables['student']['params'])
    state = create_train_state(jax.random.PRNGKey(0), variables['student'],
                               tx)
    train_step = build_train_step(fmodel, tx, donate=False)
    f_total = []
    f_dist = {k: [] for k in dkeys}
    for img, gt in batches:
        state, log_vars = train_step(
            state, variables['teachers'],
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(gt))
        f_total.append(float(log_vars['loss']))
        assert all(k in log_vars for k in dkeys), sorted(log_vars)
        for k in dkeys:
            f_dist[k].append(float(log_vars[k]))

    np.testing.assert_allclose(
        f_total, t_total, rtol=3e-4,
        err_msg=f'MT total-loss trajectory: {f_total} vs {t_total}')
    for k in dkeys:
        np.testing.assert_allclose(
            f_dist[k], t_dist[k], rtol=5e-3, atol=1e-5,
            err_msg=f'{k} trajectory: {f_dist[k]} vs {t_dist[k]}')


def test_channel_adapter_gradients_match_torch_conv1d_twin():
    """The channel_nums 1x1 adapter (ref contract opts.py:25-27, Conv1d
    opts.py:115-125): value AND gradients (input, kernel, bias) of
    CGD(adapter(x_s), x_t) must match a torch nn.Conv1d twin applied over
    flattened spatial positions."""
    from segdistill_tpu.distill.losses import CGDLoss

    rs = np.random.RandomState(7)
    B, C_S, C_T, H, W = 2, 6, 10, 8, 8
    x_s = rs.randn(B, C_S, H, W).astype(np.float32)
    x_t = rs.randn(B, C_T, H, W).astype(np.float32)
    gt = rs.randint(0, 5, (B, 2 * H, 2 * W)).astype(np.int32)
    w = rs.randn(C_T, C_S, 1).astype(np.float32) * 0.3
    bias = rs.randn(C_T).astype(np.float32) * 0.1

    # ---- torch twin ----
    tx_s = torch.tensor(x_s, requires_grad=True)
    conv = torch.nn.Conv1d(C_S, C_T, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        conv.bias.copy_(torch.tensor(bias))
    flat = tx_s.reshape(B, C_S, H * W)
    adapted = conv(flat).reshape(B, C_T, H, W)
    crit = REF.CGDLoss(group_size=5, alpha=3, tau=2)
    t_loss = crit(adapted, torch.tensor(x_t),
                  torch.tensor(gt)[:, None].long(), 1)
    t_loss.backward()

    # ---- flax/jax side: the engine's einsum adapter ----
    def loss_fn(xs, kernel, b):
        a = jnp.einsum('bchw,cd->bdhw', xs, kernel) \
            + b[None, :, None, None]
        return CGDLoss(group_size=5, alpha=3, tau=2)(
            a, jnp.asarray(x_t), jnp.asarray(gt), 1)

    kernel = jnp.asarray(w[:, :, 0].T)  # (C_S, C_T)
    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(x_s), kernel, jnp.asarray(bias))

    np.testing.assert_allclose(float(val), float(t_loss.detach()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads[0]), tx_s.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[1]),
                               conv.weight.grad.numpy()[:, :, 0].T,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[2]),
                               conv.bias.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
