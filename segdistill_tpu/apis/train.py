"""Training orchestration (ref contract: mmseg/apis/train.py:14-138)."""

import os
import random

import jax
import numpy as np

from ..datasets import build_dataloader, build_dataset
from ..engine import (IterBasedRunner, build_lr_schedule, build_optimizer,
                      build_train_step, create_train_state, load_weights,
                      resume_latest)
from ..core.evaluation import EvalHook
from ..parallel import create_mesh, replicate
from ..utils import get_root_logger


def set_random_seed(seed, deterministic=True):
    """(ref apis/train.py:14-29). JAX is deterministic by construction with
    explicit PRNG keys; this seeds the host-side pipeline RNGs."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def _merge_loaded_vars(template, loaded, strict, path):
    """Copy matching-(path, shape) leaves of ``loaded`` into ``template``
    (the lenient strict=False load semantics of ref SD_structure.py:36)."""
    import jax.numpy as jnp

    def _flatten(tree, prefix=()):
        out = {}
        for k, v in dict(tree).items():
            if isinstance(v, dict) or hasattr(v, 'items'):
                out.update(_flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v
        return out

    flat_loaded = _flatten(loaded)
    missing = []

    def sub(key_path, leaf):
        key = tuple(getattr(p, 'key', getattr(p, 'idx', p))
                    for p in key_path)
        got = flat_loaded.pop(key, None)
        if got is not None and tuple(got.shape) == tuple(leaf.shape):
            return jnp.asarray(got, leaf.dtype)
        missing.append('.'.join(map(str, key)))
        return leaf

    out = jax.tree_util.tree_map_with_path(sub, template)
    unexpected = ['.'.join(map(str, k)) for k in flat_loaded]
    if strict and (missing or unexpected):
        raise RuntimeError(
            f'strict load from {path} failed: missing={missing[:20]} '
            f'unexpected={unexpected[:20]}')
    return out


def _load_pretrain(variables, path, model, strict, backbone_only=False):
    """``t_pretrain``/``s_pretrain`` loader: a torch ``.pth`` (the
    reference contract, SD_structure.py:29-37) or an orbax checkpoint
    dir produced by tools/train.py — so a teacher can be distilled
    straight from a local training run without a round trip through
    torch."""
    import os.path as osp
    if osp.isdir(path):
        from .inference import _load_orbax_student
        loaded = _load_orbax_student(path, variables)
        return _merge_loaded_vars(variables, loaded, strict, path)
    from ..convert import load_pth_into_variables
    return load_pth_into_variables(variables, path, model, strict=strict,
                                   backbone_only=backbone_only)


def init_segmentor_state(model, cfg, rng, input_shape=(1, 512, 512, 3)):
    """Init model variables + load any pretrained/teacher weights.
    -> (student_variables, teacher_variables_or_empty)."""
    variables = model.init_variables(rng, input_shape)

    if 'teacher' in variables:  # SDModule
        student_vars, teacher_vars = variables['student'], \
            variables['teacher']
        if getattr(model, 't_pretrain', None):
            teacher_vars = _load_pretrain(
                teacher_vars, model.t_pretrain, model.teacher,
                strict=False)  # ref strict=False (SD_structure.py:36)
        if getattr(model, 's_pretrain', None):
            student_vars = _load_pretrain(
                student_vars, model.s_pretrain, model.student, strict=True)
        elif getattr(model.student, 'pretrained', None):
            student_vars = _load_pretrain(
                student_vars, model.student.pretrained, model.student,
                strict=False, backbone_only=True)
        return student_vars, teacher_vars
    if getattr(model, 'pretrained', None):
        variables = _load_pretrain(
            variables, model.pretrained, model, strict=False,
            backbone_only=True)
    return variables, {}


def train_segmentor(model, dataset, cfg, distributed=True, validate=False,
                    timestamp=None, meta=None):
    """(ref apis/train.py:32-138)."""
    logger = get_root_logger()
    seed = cfg.get('seed', None) or 42
    rng = set_random_seed(seed)

    datasets = dataset if isinstance(dataset, (list, tuple)) else [dataset]
    loader = build_dataloader(
        datasets[0],
        cfg.data['samples_per_gpu'],
        cfg.data['workers_per_gpu'],
        dist=distributed, shuffle=True, seed=seed, drop_last=True,
        loader_backend=cfg.data.get('loader_backend', 'host'),
        aug_cfg=cfg.data.get('aug_cfg'))

    mesh = create_mesh()
    crop = tuple(cfg.get('crop_size', (512, 512)))
    init_rng, state_rng = jax.random.split(rng)
    student_vars, teacher_vars = init_segmentor_state(
        model, cfg, init_rng, (1, crop[0], crop[1], 3))

    max_iters = cfg.runner['max_iters'] if 'runner' in cfg \
        else cfg['total_iters']
    lr_schedule = build_lr_schedule(cfg.get('lr_config'),
                                    cfg.optimizer['lr'], max_iters)
    tx = build_optimizer(cfg.optimizer, student_vars['params'], lr_schedule)
    state = create_train_state(state_rng, student_vars, tx)

    state = replicate(state, mesh)
    teacher_vars = replicate(teacher_vars, mesh)

    work_dir = cfg.get('work_dir')
    if cfg.get('resume_from'):
        # explicit resume is strict: a missing/corrupt checkpoint raises
        # instead of silently restarting a 160k-iter run at iter 0
        # (the reference at least prints, apis/train.py:129-133)
        state, _ = resume_latest(cfg['resume_from'], state, strict=True)
        logger.info(f'resumed from {cfg["resume_from"]} '
                    f'at iter {int(state.step)}')
    elif work_dir and cfg.get('auto_resume', False):
        state, resumed = resume_latest(work_dir, state)
        if resumed:
            logger.info(f'auto-resumed at iter {int(state.step)}')
    elif cfg.get('load_from'):
        # weights-only warm start: params + BN stats, iteration counter
        # and optimizer state stay fresh (ref apis/train.py:134-135)
        state = load_weights(cfg['load_from'], state)
        logger.info(f'loaded weights from {cfg["load_from"]} '
                    f'(warm start, iter 0)')

    train_step = build_train_step(model, tx, lr_schedule)
    # steps-per-loop decoupling (TPU-native extension; see
    # build_multi_train_step): runner=dict(..., steps_per_dispatch=k)
    steps_per_dispatch = int(cfg.runner.get('steps_per_dispatch', 1)) \
        if 'runner' in cfg else 1
    multi_train_step = None
    if steps_per_dispatch > 1:
        from ..engine import build_multi_train_step
        multi_train_step = build_multi_train_step(model, tx, lr_schedule)

    eval_hook = None
    if validate and cfg.get('evaluation'):
        from .test import fast_evaluate
        val_dataset = build_dataset(cfg.data['val'],
                                    dict(test_mode=True))

        def eval_fn(runner_state):
            svars = {'params': runner_state.params,
                     **runner_state.model_state}
            return fast_evaluate(model, svars, val_dataset,
                                 metric=cfg.evaluation.get('metric',
                                                           'mIoU'))
        eval_hook = EvalHook(eval_fn,
                             interval=cfg.evaluation.get('interval', 2000))

    # checkpoint meta: version + full config + CLASSES/PALETTE
    # (ref tools/train.py:145-153; read back by tools/test.py:131-135)
    from ..version import __version__

    def _plain(x):
        return np.asarray(x).tolist() if x is not None else None

    ckpt_meta = dict(
        segdistill_tpu_version=__version__,
        config=cfg.pretty_text,
        CLASSES=list(getattr(datasets[0], 'CLASSES', None) or []) or None,
        PALETTE=_plain(getattr(datasets[0], 'PALETTE', None)))

    runner = IterBasedRunner(
        model=model, train_step=train_step, state=state,
        teacher_vars=teacher_vars, mesh=mesh, max_iters=max_iters,
        work_dir=work_dir,
        log_interval=cfg.get('log_config', {}).get('interval', 50),
        logger=logger,
        checkpoint_interval=cfg.get('checkpoint_config', {}).get(
            'interval', 4000),
        max_keep_ckpts=cfg.get('checkpoint_config', {}).get(
            'max_keep_ckpts', 1),
        eval_hook=eval_hook,
        meta=ckpt_meta,
        multi_train_step=multi_train_step,
        steps_per_dispatch=steps_per_dispatch,
        tensorboard=any(
            h.get('type') == 'TensorboardLoggerHook'
            for h in cfg.get('log_config', {}).get('hooks', [])))
    return runner.run(loader, cfg.get('workflow', [('train', 1)]))
