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
    parser.add_argument('config', nargs='?', default=None,
                        help='training config; omit with --bench')
    parser.add_argument('--bench', action='store_true',
                        help='profile the exact bench.py workload '
                             '(bf16 B0<-B3 CGD recipe) instead of a '
                             'config')
    parser.add_argument('--trace-dir', default='/tmp/segdistill_trace')
    parser.add_argument('--steps', type=int, default=5)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--crop', type=int, default=512)
    parser.add_argument('--report', action='store_true',
                        help='parse the xplane proto and print per-op '
                             'costs (works over the axon tunnel)')
    parser.add_argument('--top', type=int, default=30)
    return parser.parse_args()


def main():
    args = parse_args()
    if args.bench:
        import time

        t0 = time.monotonic()

        def note(msg):
            # stderr progress (mirrors bench.py's driver-proofing): an
            # external timeout's tail shows *where* the run stalled
            print('[profile %6.1fs] %s' % (time.monotonic() - t0, msg),
                  file=sys.stderr, flush=True)

        import bench
        note('building model')
        _, step_fn, state, tv, batch, _ = bench.build()
        note('warmup step (compile if cache-cold)')
        state, log_vars = step_fn(state, tv, batch['img'], batch['gt'])
        jax.block_until_ready(log_vars['loss'])
        note('tracing %d steps' % args.steps)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(args.steps):
                state, log_vars = step_fn(state, tv, batch['img'],
                                          batch['gt'])
            jax.block_until_ready(log_vars['loss'])
        print(f'trace written to {args.trace_dir}')
        if args.report:
            report_xplane(args.trace_dir, args.steps, args.top)
        return
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
    if args.report:
        report_xplane(args.trace_dir, args.steps, args.top)


def report_xplane(trace_dir, steps, top=30):
    """Parse the xplane proto directly and print per-step XLA-op costs —
    the only profiling readout that works over the axon tunnel
    (docs/perf.md 'Profiling method')."""
    import collections
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        f'{trace_dir}/**/*.xplane.pb', recursive=True))
    if not paths:
        print('no xplane.pb found under', trace_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    per_category = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        stats_meta = {i: m.name for i, m in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Ops':
                continue
            ev_meta = {i: m.name for i, m in plane.event_metadata.items()}
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, '?')
                dur = ev.duration_ps
                total_ps += dur
                per_op[name] += dur
                cat = 'other'
                for st in ev.stats:
                    if stats_meta.get(st.metadata_id) == 'category':
                        cat = st.str_value or 'other'
                if cat == 'other':
                    # classify from the HLO op name (axon traces often
                    # lack the category stat)
                    n = name.split(' = ')[0].lstrip('%')
                    if 'jvp' in n and 'custom-call' in name \
                            or 'custom-call' in name and (
                                'jvp' in name or 'Custom' in name):
                        cat = 'pallas custom-call'
                    elif n.startswith('%') or 'fusion' in n:
                        cat = 'fusion'
                    elif 'convolution' in n:
                        cat = 'convolution'
                    elif 'copy' in n:
                        cat = 'copy/layout'
                    elif 'custom-call' in name:
                        cat = 'custom-call'
                    elif 'all-reduce' in n or 'all-gather' in n \
                            or 'collective' in n:
                        cat = 'collective'
                    else:
                        cat = n.split('.')[0].split('_')[0] or 'other'
                per_category[cat] += dur
    ms = 1e-9  # ps -> ms
    print(f'\ntotal XLA-op time: {total_ps * ms:.2f} ms over {steps} steps '
          f'({total_ps * ms / steps:.2f} ms/step)')
    print(f'\n-- by category (ms/step) --')
    for cat, ps in per_category.most_common(15):
        print(f'{ps * ms / steps:9.3f}  {cat}')
    print(f'\n-- top {top} ops (ms/step) --')
    for name, ps in per_op.most_common(top):
        print(f'{ps * ms / steps:9.3f}  {name[:110]}')


if __name__ == '__main__':
    main()
