"""Full-chain distillation-step parity vs the reference source
(VERDICT r2, Missing #1 / Next #1).

Round 2 verified the models and the losses separately; the GLUE was only
self-consistent: which tensor the reference's forward hook captures at
``decode_head.linear_pred`` vs what our ``sow`` tap captures, the
NHWC->NCHW conversion, the distill-loss weighting and the merge into the
total loss (ref SD_structure.py:61-90 + opts.py:48-110). This file gates
that composition: a torch SDModule oracle built from the reference's OWN
``Extractor``/``DistillationLoss``/loss classes (imported verbatim via
tests/ref_shims.py) against the production jitted ``build_train_step``.

A wrong tap tensor, a dropped transpose, a mis-weighted alpha or a wrong
step counter fails these tests loudly.

Deliberate divergence (documented in PARITY.md): the reference runs the
teacher in TRAIN mode during distillation (mmcv's runner calls
``model.train()`` on the whole SDModule after the ``teacher.eval()`` at
init, SD_structure.py:37 — so teacher dropout/drop-path stay active and
teacher BN uses batch stats). Our framework runs the teacher in eval
mode (deterministic features, frozen stats). The oracle therefore runs
its teacher in eval with all stochastic depths at p=0 so both frameworks
see identical teacher features.
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

# every test builds a full b0+b1 SDModule pair (two compiles) — slow tier
pytestmark = pytest.mark.slow

from test_ref_anchor import (  # noqa: E402
    NORM, RefSegformer, _ref_head, _zero_stochastic)
from test_torch_parity import _randomize  # noqa: E402
from segdistill_tpu.convert.torch_loader import (  # noqa: E402
    load_pth_into_variables)
from segdistill_tpu.models import build_segmentor  # noqa: E402

N_CLASSES = 19


class TorchSDOracle(torch.nn.Module):
    """The reference SDModule distillation step, rebuilt from the
    reference's own parts (SD_structure.py:61-90):

    * forward hooks registered by the reference ``Extractor`` (opts.py)
    * student forward_train through the reference BaseDecodeHead.losses
    * teacher forward under no_grad (hooks fire)
    * the reference ``DistillationLoss`` dispatcher on the hooked feats
    * ``cnt`` incremented BEFORE the losses (SD_structure.py:62)
    """

    def __init__(self, student, teacher, distillation):
        super().__init__()
        self.student = student
        self.teacher = teacher
        self.teacher.eval()
        for p in self.teacher.parameters():
            p.requires_grad = False
        self.extractor = REF.Extractor(student, teacher, distillation)
        self.distillation_loss = REF.DistillationLoss(distillation)
        self.cnt = 0

    def forward_train(self, img, gt):
        self.cnt += 1
        feats = self.student.backbone(img)
        loss_dict = {f'decode.{k}': v for k, v in
                     self.student.decode_head.forward_train(
                         feats, None, gt, None).items()}
        with torch.no_grad():
            t_feats = self.teacher.backbone(img)
            self.teacher.decode_head.forward_train(t_feats, None, gt, None)
        d = self.distillation_loss(self.extractor.student_features,
                                   self.extractor.teacher_features,
                                   gt, self.cnt, self.student, self.teacher)
        loss_dict.update(d)
        return loss_dict

    @staticmethod
    def parse_losses(loss_dict):
        """ref base.py:174-199: mean every entry, sum the 'loss' keys."""
        log_vars = {k: (v.mean() if isinstance(v, torch.Tensor)
                        else sum(x.mean() for x in v))
                    for k, v in loss_dict.items()}
        total = sum(v for k, v in log_vars.items() if 'loss' in k)
        return total, log_vars


def _distillation(loss_name, loss_config):
    return [{'student_layer': 'decode_head.linear_pred',
             'teacher_layer': 'decode_head.linear_pred',
             'loss_name': loss_name,
             'loss_config': dict(loss_config)}]


def _flax_cfg(backbone, in_channels, embed_dim=64):
    return dict(
        type='EncoderDecoder',
        backbone=dict(type=backbone, gelu_approximate=False,
                      drop_path_rate=0.0),
        decode_head=dict(
            type='SegFormerHead', in_channels=in_channels,
            in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
            channels=128, dropout_ratio=0.0, num_classes=N_CLASSES,
            norm_cfg=NORM, align_corners=False,
            decoder_params=dict(embed_dim=embed_dim)),
        test_cfg=dict(mode='whole'))


def _build_pair(tmp_path, loss_name, loss_config):
    """-> (torch oracle, flax SDModule, flax variables) with identical
    weights loaded through the production converter."""
    t_student = _zero_stochastic(_randomize(
        RefSegformer(REF.mit_b0(), _ref_head([32, 64, 160, 256])), seed=41))
    t_teacher = _zero_stochastic(_randomize(
        RefSegformer(REF.mit_b1(), _ref_head([64, 128, 320, 512])), seed=42))

    oracle = TorchSDOracle(t_student, t_teacher,
                           _distillation(loss_name, loss_config))

    sd_cfg = dict(
        type='SDModule',
        cfg_s=_flax_cfg('mit_b0', [32, 64, 160, 256]),
        cfg_t=_flax_cfg('mit_b1', [64, 128, 320, 512]),
        distillation=_distillation(loss_name, loss_config),
        test_cfg=dict(mode='whole'))
    fmodel = build_segmentor(sd_cfg)
    variables = fmodel.init_variables(jax.random.PRNGKey(0), (1, 64, 64, 3))

    s_path, t_path = str(tmp_path / 's.pth'), str(tmp_path / 't.pth')
    torch.save(t_student.state_dict(), s_path)
    torch.save(t_teacher.state_dict(), t_path)
    variables['student'] = load_pth_into_variables(variables['student'],
                                                   s_path)
    variables['teacher'] = load_pth_into_variables(variables['teacher'],
                                                   t_path)
    return oracle, fmodel, variables


def _batches(n, seed, b=2, hw=64):
    rs = np.random.RandomState(seed)
    return [(rs.randn(b, 3, hw, hw).astype(np.float32),
             np.where(rs.rand(b, hw, hw) < 0.1, 255,
                      rs.randint(0, N_CLASSES, (b, hw, hw))).astype(np.int32))
            for _ in range(n)]


def _flax_loss_dict(fmodel, variables, img, gt, step):
    losses, _ = fmodel.forward_train(
        variables['student'], variables['teacher'],
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(gt), step,
        rngs={'dropout': jax.random.PRNGKey(1)},
        shuffle_rng=jax.random.PRNGKey(2))
    return {k: float(jnp.mean(v)) for k, v in losses.items()}


@pytest.mark.parametrize('loss_name,loss_config', [
    ('CGDLoss', dict(group_size=10, alpha=3, tau=2)),  # 19 % 10 -> pad path
    ('PDLoss', {}),
    ('ATLoss', {}),
])
def test_step1_loss_dict_parity(tmp_path, loss_name, loss_config):
    """One full distillation forward: every loss-dict entry (key AND
    value) matches the reference composition at cnt == 1."""
    oracle, fmodel, variables = _build_pair(tmp_path, loss_name,
                                            loss_config)
    (img, gt), = _batches(1, seed=50)
    want = {k: float(v.detach().mean()) for k, v in
            oracle.forward_train(torch.from_numpy(img),
                                 torch.from_numpy(gt)[:, None].long()
                                 ).items()}
    got = _flax_loss_dict(fmodel, variables, img, gt, step=1)
    assert set(got) == set(want), (got.keys(), want.keys())
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], rtol=3e-4, atol=1e-6,
            err_msg=f'loss key {k!r} diverged from the reference chain')


@pytest.mark.slow
def test_cgd_trajectory_through_jitted_train_step(tmp_path):
    """6 seeded SGD steps of CGD B0<-B1 through the PRODUCTION jitted
    ``build_train_step`` vs the torch oracle: total loss and the distill
    component must track. This is the gate for 'the train step the mIoU
    claim rests on is verified' (VERDICT r2 Next #1)."""
    oracle, fmodel, variables = _build_pair(
        tmp_path, 'CGDLoss', dict(group_size=10, alpha=3, tau=2))
    lr = 0.05
    batches = _batches(6, seed=51)
    dkey = ('loss_decode_head.linear_pred<->'
            'decode_head.linear_pred_other')

    opt = torch.optim.SGD(
        [p for p in oracle.student.parameters() if p.requires_grad], lr=lr)
    t_total, t_distill = [], []
    for img, gt in batches:
        opt.zero_grad()
        loss_dict = oracle.forward_train(torch.from_numpy(img),
                                         torch.from_numpy(gt)[:, None]
                                         .long())
        total, log_vars = oracle.parse_losses(loss_dict)
        total.backward()
        opt.step()
        t_total.append(float(total.detach()))
        t_distill.append(float(log_vars[dkey].detach()))

    from segdistill_tpu.engine import (build_optimizer, build_train_step,
                                       create_train_state)
    tx = build_optimizer(dict(type='SGD', lr=lr, momentum=0.0,
                              weight_decay=0.0),
                         variables['student']['params'])
    state = create_train_state(jax.random.PRNGKey(0), variables['student'],
                               tx)
    train_step = build_train_step(fmodel, tx, donate=False)
    f_total, f_distill = [], []
    for img, gt in batches:
        state, log_vars = train_step(
            state, variables['teacher'],
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(gt))
        f_total.append(float(log_vars['loss']))
        f_distill.append(float(log_vars[dkey]))

    np.testing.assert_allclose(
        f_total, t_total, rtol=3e-4,
        err_msg=f'total-loss trajectory: flax {f_total} vs torch {t_total}')
    np.testing.assert_allclose(
        f_distill, t_distill, rtol=5e-3, atol=1e-5,
        err_msg=f'CGD trajectory: flax {f_distill} vs torch {t_distill}')


def test_wrong_alpha_fails_the_gate(tmp_path):
    """Sanity of the gate itself: perturbing the distill weight by 10%
    must be detected (i.e. the test is sensitive to mis-weighted alpha,
    not vacuously passing because the distill term is negligible)."""
    oracle, fmodel, variables = _build_pair(
        tmp_path, 'CGDLoss', dict(group_size=10, alpha=3, tau=2))
    (img, gt), = _batches(1, seed=52)
    want = {k: float(v.detach().mean()) for k, v in
            oracle.forward_train(torch.from_numpy(img),
                                 torch.from_numpy(gt)[:, None].long()
                                 ).items()}
    dkey = ('loss_decode_head.linear_pred<->'
            'decode_head.linear_pred_other')
    got = _flax_loss_dict(fmodel, variables, img, gt, step=1)
    rel = abs(got[dkey] - 1.1 * want[dkey]) / max(abs(want[dkey]), 1e-12)
    assert rel > 0.05, 'gate would not notice a 10% alpha error'
