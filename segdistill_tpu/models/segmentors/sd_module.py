"""SDModule: the student+frozen-teacher distillation segmentor
(ref contract: mmseg/models/segmentors/SD_structure.py:18-223).

TPU-first redesign:

* teacher params live in a separate frozen variable tree under
  ``jax.lax.stop_gradient`` — no ``requires_grad`` bookkeeping, no DDP
  ``find_unused_parameters`` problem (SURVEY §2.10);
* the iteration counter driving loss schedules/shuffles is the optimizer
  step threaded through the jitted train step (pure; resume-safe — the
  reference needs the ``model.cnt = runner.iter`` hack, apis/train.py:136);
* inference delegates to the student exactly like the reference
  (SD_structure.py:146-223).
"""

import jax

from ...core.utils import add_prefix  # noqa: F401 (loss keys stay flat, ref)
from ...distill import DistillationLoss, needed_layers
from .. import builder
from ..builder import SEGMENTORS
from .base import BaseSegmentor


def _teacher_perf_defaults(cfg_t, teacher_layers=()):
    """Perf defaults for the frozen teacher inside the train step.

    A teacher MiT defaults its Mix-FFN depthwise to the 'conv' backend:
    inside the jitted train step XLA overlaps the bf16 conv forward with
    the student's backward better than the tap-sum form (measured 201 vs
    191 imgs/s B0<-B3, docs/perf.md round 3; fp32 still taps regardless
    — see ops/dwconv.py). Standalone inference keeps 'auto' (tap).

    The forward-only fused SRA kernel is deliberately NOT defaulted for
    teachers: measured on-chip it REGRESSED the B0<-B3 bench step 35.9 ->
    38.5 ms (XLA's unfused bf16-score path overlaps the student backward
    better than the Pallas call, which is a fusion barrier at every B3
    stage shape; docs/perf.md round-4 notes). It stays an explicit
    config knob (``backbone.fused_attention``) — note the fused paths
    cannot sow the 'ATTN' tap. Explicit config values win.
    """
    del teacher_layers  # kept for the knob's gating history (docs above)
    bb = cfg_t.get('backbone')
    if isinstance(bb, dict) and str(bb.get('type', '')).startswith('mit'):
        bb = dict(bb)
        bb.setdefault('dwconv_backend', 'conv')
        cfg_t = dict(cfg_t)
        cfg_t['backbone'] = bb
    return cfg_t


def _init_adapters(distillation, rng):
    """Trainable 1x1 channel adapters for cross-width student/teacher
    pairs (ref 'channel_nums' contract, opts.py:25-27 + Conv1d
    :115-125); kept in the student params so the optimizer trains them
    alongside the student. Init matches torch nn.Conv1d's default
    (U(-1/sqrt(c_in), 1/sqrt(c_in)) for kernel and bias)."""
    import jax.numpy as jnp
    adapters = {}
    for i, entry in enumerate(distillation):
        nums = entry.get('channel_nums')
        if nums is None:
            continue
        c_s, c_t = nums
        rng, k_k, k_b = jax.random.split(rng, 3)
        scale = (1.0 / c_s) ** 0.5
        adapters[f'adapter_{i}'] = {
            'kernel': jax.random.uniform(k_k, (c_s, c_t), jnp.float32,
                                         -scale, scale),
            'bias': jax.random.uniform(k_b, (c_t,), jnp.float32,
                                       -scale, scale),
        }
    return adapters


def _split_adapters(student_vars):
    """-> (student_vars without the adapter subtree, adapters_or_None)."""
    adapters = student_vars.get('params', {}).get('distill_adapters')
    if adapters is None:
        return student_vars, None
    params = {k: v for k, v in student_vars['params'].items()
              if k != 'distill_adapters'}
    return {**student_vars, 'params': params}, adapters


@SEGMENTORS.register_module()
class SDModule(BaseSegmentor):

    def __init__(self, cfg_s, cfg_t, train_cfg=None, test_cfg=None,
                 distillation=None, s_pretrain=None, t_pretrain=None,
                 dtype=None, pretrained=None):
        del pretrained  # student/teacher weights come via *_pretrain
        self.distillation = distillation or []
        self.s_pretrain = s_pretrain
        self.t_pretrain = t_pretrain

        self.student_layers, self.teacher_layers = \
            needed_layers(self.distillation)

        self.student = builder.build_segmentor(
            dict(cfg_s), train_cfg=train_cfg, test_cfg=test_cfg)
        cfg_t = dict(cfg_t)
        cfg_t['pretrained'] = None  # ref SD_structure.py:33
        self.teacher = builder.build_segmentor(
            _teacher_perf_defaults(cfg_t, self.teacher_layers),
            train_cfg=train_cfg, test_cfg=test_cfg)

        self.distillation_loss = DistillationLoss(self.distillation)
        self.log_grad = bool(self.distillation
                             and 'log_grad' in self.distillation[0])

        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or {}
        self.align_corners = False
        self.num_classes = self.student.num_classes

    # ------------------------------------------------------------------ init
    def init_variables(self, rng, input_shape=(1, 512, 512, 3)):
        rng_s, rng_t, rng_a = jax.random.split(rng, 3)
        student = self.student.init_variables(rng_s, input_shape)
        adapters = _init_adapters(self.distillation, rng_a)
        if adapters:
            student = dict(student)
            student['params'] = dict(student['params'],
                                     distill_adapters=adapters)
        return {
            'student': student,
            'teacher': self.teacher.init_variables(rng_t, input_shape),
        }

    # ------------------------------------------------------------- training
    def forward_train(self, student_vars, teacher_vars, img, gt, step,
                      rngs=None, shuffle_rng=None):
        """Pure fn -> (loss dict, new student model state).

        Mirrors SD_structure.py:61-90: student forward (grad), teacher
        forward (stop_gradient, eval mode), distill losses merged into the
        loss dict under the reference's key layout.
        """
        capture = bool(self.distillation)
        student_vars, adapters = _split_adapters(student_vars)
        losses, s_feats, new_state = self.student.forward_train(
            student_vars, img, gt, rngs=rngs, capture_feats=capture)
        if capture:
            # unused taps never reach the loss -> XLA dead-code-eliminates
            # them at train-step compile; no filtering needed
            t_feats = self.teacher.forward_feats(
                jax.lax.stop_gradient(teacher_vars), img, train=False)
            d_losses = self.distillation_loss(
                s_feats, t_feats, gt, step, rng=shuffle_rng,
                adapters=adapters)
            losses.update(d_losses)
        return losses, new_state

    # ------------------------------------------------------------ inference
    def encode_decode(self, variables, img, train=False):
        return self.student.encode_decode(variables, img, train=train)

    def whole_inference(self, variables, img, ori_shape=None, rescale=False):
        return self.student.whole_inference(variables, img, ori_shape,
                                            rescale)

    def slide_inference(self, variables, img, ori_shape=None, rescale=False):
        return self.student.slide_inference(variables, img, ori_shape,
                                            rescale)

    def inference(self, variables, img, ori_shape=None, rescale=False,
                  flip=False, flip_direction='horizontal'):
        return self.student.inference(variables, img, ori_shape, rescale,
                                      flip, flip_direction)

    def simple_test(self, variables, img, ori_shape=None, rescale=True,
                    flip=False, flip_direction='horizontal'):
        return self.student.simple_test(variables, img, ori_shape, rescale,
                                        flip, flip_direction)

    def aug_test(self, variables, imgs, metas, rescale=True):
        return self.student.aug_test(variables, imgs, metas, rescale)


@SEGMENTORS.register_module()
class SDModuleMT(BaseSegmentor):
    """Multi-teacher variant (ref SD_structure.py:226-355). Teacher tap names
    get the teacher index appended (ref opts.py:153-157)."""

    def __init__(self, cfg_s, cfg_t, train_cfg=None, test_cfg=None,
                 distillation=None, s_pretrain=None, t_pretrain=None):
        self.distillation = distillation or []
        self.s_pretrain = s_pretrain
        self.t_pretrain = t_pretrain

        self.student = builder.build_segmentor(
            dict(cfg_s), train_cfg=train_cfg, test_cfg=test_cfg)
        _, t_layers = needed_layers(self.distillation)
        self.teachers = []
        for c in cfg_t:
            c = dict(c)
            c['pretrained'] = None
            self.teachers.append(builder.build_segmentor(
                _teacher_perf_defaults(c, t_layers), train_cfg=train_cfg,
                test_cfg=test_cfg))

        # Two reference dispatch modes (DistillationLossMT, opts.py:184-209):
        # * aligned (len(features) == len(entries)): entry i pairs with
        #   teacher i via the index-suffixed tap name;
        # * random ensemble (one entry, many teachers, ref :186-197): the
        #   criterion sees every teacher. The reference criteria for that
        #   path are commented out; the TPU-native interpretation computes
        #   the entry's loss against EVERY teacher and randomly selects one
        #   per step (key 'loss_random', ref :196) — jit-friendly for
        #   teachers of different widths, expectation-equal to sampling a
        #   teacher per step.
        self.random_ensemble = (len(self.distillation) == 1
                                and len(self.teachers) > 1)
        if self.random_ensemble:
            # one DistillationLoss per teacher: forward_train selects the
            # step's teacher with lax.switch, so only ONE teacher forward
            # + loss is computed per step (not N computed and N-1
            # discarded)
            self.per_teacher_losses = [
                DistillationLoss([dict(self.distillation[0],
                                       teacher_layer=self.distillation[0][
                                           'teacher_layer'] + str(i))])
                for i in range(len(self.teachers))]
            entries = []
        else:
            # aligned path: entry i pairs with teacher i; the loss-key
            # info suffix is the entry index (ref opts.py:203-208)
            entries = [dict(entry,
                            teacher_layer=entry['teacher_layer'] + str(i),
                            loss_info=str(i))
                       for i, entry in enumerate(self.distillation)]
        self.distillation_loss = DistillationLoss(entries)
        self.student_layers, _ = needed_layers(self.distillation)

        self.train_cfg = train_cfg or {}
        self.test_cfg = test_cfg or {}
        self.align_corners = False
        self.num_classes = self.student.num_classes

    def init_variables(self, rng, input_shape=(1, 512, 512, 3)):
        rngs = jax.random.split(rng, len(self.teachers) + 2)
        student = self.student.init_variables(rngs[0], input_shape)
        adapters = _init_adapters(self.distillation, rngs[-1])
        if adapters:
            student = dict(student)
            student['params'] = dict(student['params'],
                                     distill_adapters=adapters)
        return {
            'student': student,
            'teachers': [t.init_variables(r, input_shape)
                         for t, r in zip(self.teachers, rngs[1:-1])],
        }

    def forward_train(self, student_vars, teacher_vars_list, img, gt, step,
                      rngs=None, shuffle_rng=None):
        student_vars, adapters = _split_adapters(student_vars)
        losses, s_feats, new_state = self.student.forward_train(
            student_vars, img, gt, rngs=rngs, capture_feats=True)
        if self.random_ensemble:
            # random teacher ensemble (ref opts.py:186-197, key
            # 'loss_random'): pick the step's teacher, then lax.switch
            # into that teacher's forward + loss — one teacher's compute
            # per step, with gradients flowing through the selected
            # branch only
            import jax.numpy as jnp
            sel_rng = shuffle_rng if shuffle_rng is not None \
                else jax.random.key(0)
            idx = jax.random.randint(
                jax.random.fold_in(sel_rng, step), (), 0,
                len(self.teachers))

            def _branch(i):
                def f(_):
                    teacher = self.teachers[i]
                    tvars = teacher_vars_list[i]
                    feats = teacher.forward_feats(
                        jax.lax.stop_gradient(tvars), img, train=False)
                    t_feats = {k + str(i): v for k, v in feats.items()}
                    d = self.per_teacher_losses[i](s_feats, t_feats, gt,
                                                   step, rng=shuffle_rng,
                                                   adapters=adapters)
                    (val,) = d.values()
                    return jnp.asarray(val, jnp.float32)
                return f

            val = jax.lax.switch(
                idx, [_branch(i) for i in range(len(self.teachers))], None)
            d_losses = {'loss_random': val}
        else:
            t_feats = {}
            for i, (teacher, tvars) in enumerate(
                    zip(self.teachers, teacher_vars_list)):
                feats = teacher.forward_feats(
                    jax.lax.stop_gradient(tvars), img, train=False)
                t_feats.update({k + str(i): v for k, v in feats.items()})
            d_losses = self.distillation_loss(s_feats, t_feats, gt, step,
                                              rng=shuffle_rng,
                                              adapters=adapters)
        losses.update(d_losses)
        return losses, new_state

    def simple_test(self, variables, img, **kw):
        return self.student.simple_test(variables, img, **kw)

    def inference(self, variables, img, **kw):
        return self.student.inference(variables, img, **kw)
