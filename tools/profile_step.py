#!/usr/bin/env python
"""Capture a jax.profiler trace of the distillation train step
(TPU-native replacement for the reference's IterTimerHook wall-clock only
observability; SURVEY §5 'Tracing / profiling')."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import numpy as np

from segdistill_tpu import Config
from segdistill_tpu.engine import (build_lr_schedule, build_optimizer,
                                   build_train_step, create_train_state)
from segdistill_tpu.models import build_segmentor
from segdistill_tpu.parallel import create_mesh, replicate, shard_batch


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--trace-dir', default='/tmp/segdistill_trace')
    parser.add_argument('--steps', type=int, default=5)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--crop', type=int, default=512)
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)

    def strip(d):
        if isinstance(d, dict):
            d.pop('pretrained', None)
            d.pop('t_pretrain', None)
            d.pop('s_pretrain', None)
            for v in d.values():
                strip(v)
    strip(model_cfg)

    model = build_segmentor(model_cfg, train_cfg=cfg.get('train_cfg'),
                            test_cfg=cfg.get('test_cfg'))
    variables = model.init_variables(jax.random.key(0),
                                     (1, args.crop, args.crop, 3))
    sv = variables.get('student', variables)
    tv = variables.get('teacher', {})
    num_classes = model.num_classes

    lr = build_lr_schedule(dict(policy='poly', power=1.0),
                           cfg.optimizer['lr'], 160000)
    opt_cfg = dict(cfg.optimizer)
    opt_cfg.pop('_delete_', None)
    tx = build_optimizer(opt_cfg, sv['params'], lr)
    state = create_train_state(jax.random.key(1), sv, tx)
    mesh = create_mesh()
    state = replicate(state, mesh)
    tv = replicate(tv, mesh)
    step_fn = build_train_step(model, tx, lr, donate=False)

    rng = np.random.RandomState(0)
    batch = shard_batch({
        'img': rng.randn(args.batch, args.crop, args.crop,
                         3).astype(np.float32),
        'gt': rng.randint(0, num_classes,
                          (args.batch, args.crop,
                           args.crop)).astype(np.int32)}, mesh)

    # compile outside the trace
    state, log_vars = step_fn(state, tv, batch['img'], batch['gt'])
    jax.block_until_ready(log_vars['loss'])

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, log_vars = step_fn(state, tv, batch['img'], batch['gt'])
        jax.block_until_ready(log_vars['loss'])
    print(f'trace written to {args.trace_dir} '
          f'(view with tensorboard or xprof)')


if __name__ == '__main__':
    main()
